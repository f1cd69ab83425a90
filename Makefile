# reference Makefile had `format` (black -l 120) and `build` targets
.PHONY: format test test-fast test-slow bench bench-models bench-eval soak sweep native setup

setup:             # fresh-host bootstrap: editable install (pinned deps, console scripts) + native decode core
	pip install -e . --no-build-isolation
	$(MAKE) -C native

format:
	black -l 120 sota_imagenet_tpu tests train.py bench.py || true

test:
	python -m pytest tests/ -q

test-fast:         # quick tier (<10 min on the 1-core host): config/schedule/losses/optim/cmodel/data math
	python -m pytest tests/ -q -m "not slow"

test-slow:         # heavy tier: e2e, config sweeps, parallelism-mode compiles, torch oracles
	python -m pytest tests/ -q -m slow

bench:
	python bench.py

bench-models:      # per-family train-step throughput (real chip)
	python scripts/bench_models.py

bench-eval:        # forward-only serving throughput (real chip)
	python scripts/bench_models.py --eval

soak:              # crash + auto-resume drive (real chip)
	bash scripts/tpu_soak.sh

sweep:             # one real train step per config family (real chip)
	python scripts/tpu_config_sweep.py

native:
	$(MAKE) -C native
