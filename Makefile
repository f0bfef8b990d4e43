# bcd_tpu build/test entry points.
#
# The Python package needs no build step. The native CPU engine (runtime
# fallback + self-generated performance baseline) builds here or on demand
# from bcd_tpu.native_ref.

CXX ?= g++
CXXFLAGS ?= -O3 -march=native -fopenmp -std=c++17 -fPIC

native: native/libbcd_cpu.so

native/libbcd_cpu.so: native/bcd_cpu.cpp
	$(CXX) $(CXXFLAGS) -shared $< -o $@

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

# on-hardware accuracy gate: compiled Pallas kernels + engine vs goldens
# on the real TPU (tests/ run CPU-only by design; this closes the gap)
verify-tpu:
	python scripts/verify_tpu.py

golden:
	python scripts/make_golden.py

# the slow suite: independent upstream-C++ oracle + realistic-shape
# 8-device mesh tests (deselected from plain `make test` by default)
verify: native
	python -m pytest tests/ -q -m slow

clean:
	rm -f native/libbcd_cpu.so
	rm -rf .pytest_cache __pycache__

.PHONY: native test bench golden verify clean
