"""Unit tests for utils/hlo.py — the optimized-HLO collective parser used by
the collective-structure guards (tests/test_collective_structure.py).

Covers the tuple-result regression from ADVICE r4: a combined/async
collective like `(f32[..], f32[..]) all-gather(...)` used to parse as ZERO
result elements, silently disabling the zero1 gathered-volume guards.
"""

from sota_imagenet_tpu.utils.hlo import (
    collective_counts,
    collective_lines,
    result_elems,
    result_elems_each,
)

SCALAR_LINE = (
    "  %all-gather.3 = f32[64,16]{1,0} all-gather(f32[8,16]{1,0} %param.1), "
    "replica_groups={{0,1,2,3,4,5,6,7}}, dimensions={0}"
)
TUPLE_LINE = (
    "  %all-gather.7 = (f32[128,4]{1,0}, f32[32]{0}) all-gather("
    "f32[16,4]{1,0} %a, f32[4]{0} %b), replica_groups={{0,1,2,3,4,5,6,7}}, dimensions={0}"
)
START_LINE = (
    "  %all-reduce-start.1 = f32[2048]{0} all-reduce-start(f32[2048]{0} %g), "
    "replica_groups={{0,1}}, to_apply=%add"
)


def test_result_elems_scalar_result():
    assert result_elems_each(SCALAR_LINE) == [64 * 16]
    assert result_elems(SCALAR_LINE) == 64 * 16


def test_result_elems_tuple_result():
    # the ADVICE-r4 case: must count both member tensors, not zero
    assert result_elems_each(TUPLE_LINE) == [128 * 4, 32]
    assert result_elems(TUPLE_LINE) == 128 * 4 + 32


def test_result_elems_scalar_shape():
    line = "  %all-reduce.2 = f32[] all-reduce(f32[] %loss), to_apply=%add"
    assert result_elems_each(line) == [1]


def test_collective_lines_definitions_only():
    text = "\n".join(
        [
            SCALAR_LINE,
            TUPLE_LINE,
            START_LINE,
            # operand REFERENCE to a collective must not count as a definition
            "  %add.9 = f32[64,16]{1,0} add(f32[64,16]{1,0} %all-gather.3, f32[64,16]{1,0} %c)",
            "  %cp.1 = f32[8]{0} collective-permute(f32[8]{0} %x), source_target_pairs={{0,1}}",
        ]
    )
    c = collective_counts(text)
    assert c["all-gather"] == 2
    assert c["all-reduce"] == 1  # the -start variant counts as a definition
    assert c["collective-permute"] == 1
    assert c["reduce-scatter"] == 0 and c["all-to-all"] == 0
    assert len(collective_lines(text, "all-gather")) == 2
