.PHONY: native test smoke warm bench clean

native:
	python setup.py build_ext --inplace

test:
	python -m pytest tests/ -x -q

smoke:
	python -m pytest tests/ -m "not slow" -x -q

# Session-start cache warmer: compile every bench shape (+ the flagship
# train step) into .jax_cache so a later bench run starts in seconds.
# On a cold cache through the tunnel this takes 10-40+ min; rerun is fast.
warm:
	python benchmarks/warm_cache.py

bench:
	python bench.py

clean:
	rm -rf build recnet_tpu/native/*.so recnet_tpu/native/__pycache__
