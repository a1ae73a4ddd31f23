.PHONY: native test bench clean

native:
	python setup.py build_ext --inplace

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -rf build recnet_tpu/native/*.so recnet_tpu/native/__pycache__
