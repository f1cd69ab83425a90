# reference Makefile had `format` (black -l 120) and `build` targets
.PHONY: format test bench native

format:
	black -l 120 sota_imagenet_tpu tests train.py bench.py || true

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	$(MAKE) -C native
