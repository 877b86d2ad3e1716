# slim-tpu build/test entry points (the reference drives its C build with
# `make config shared=1; make` -- here the Python package needs no build;
# this Makefile covers the native runtime, tests, and benchmarks).

PY ?= python

.PHONY: all native test bench userguide clean

all: native

native: slim_tpu/native/libslimrt.so

slim_tpu/native/libslimrt.so: slim_tpu/native/slimrt.cpp
	g++ -O3 -march=native -fopenmp -shared -fPIC -std=c++17 $< -o $@

test:
	$(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py

userguide:
	$(PY) docs/userguide.py

clean:
	rm -f slim_tpu/native/libslimrt.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
