# reference Makefile had `format` (black -l 120) and `build` targets
.PHONY: format test bench bench-models bench-eval soak sweep native setup

setup:             # fresh-host bootstrap: editable install (pinned deps, console scripts) + native decode core
	pip install -e . --no-build-isolation
	$(MAKE) -C native

format:
	black -l 120 sota_imagenet_tpu tests train.py bench.py || true

test:
	python -m pytest tests/ -q

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
