# Developer entry points (counterpart of the reference's tools/Makefile
# env bootstrap -- here the environment is assumed present and targets
# drive tests/benchmarks/native builds).

.PHONY: test bench native clean

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

native:
	$(MAKE) -C efficient_tts_tpu/native

clean:
	$(MAKE) -C efficient_tts_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
