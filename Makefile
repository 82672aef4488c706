# Native build targets (reference: Makefile:1-7 builds the C engine;
# here the Python/JAX engine needs no build — these are the C++ host
# pieces: the harness and the storage loader).

CXX ?= g++
CXXFLAGS ?= -O2 -std=c++17

all: build/harness native

build/harness: tools/harness.cpp
	@mkdir -p build
	$(CXX) $(CXXFLAGS) -o $@ $<

# The ctypes loader builds itself on first import; this just forces it.
native:
	python -c "import sigmod2018_tpu.storage.native as n; \
	           print('native loader:', 'ok' if n._LIB is not None else 'UNAVAILABLE')"

# The acceptance suite: unit/e2e tests plus a seeded differential soak
# (3 chunks x 60 queries, one chunk on the 8-device virtual mesh).
test:
	python -m pytest tests/ -q -n 8
	python tools/soak.py 180 1234 60

soak:
	python tools/soak.py 600 99 150

harness: build/harness
	./build/harness /root/reference/submission/workloads/small/small.init \
	                /root/reference/submission/workloads/small/small.work \
	                /root/reference/submission/workloads/small/small.result

.PHONY: all native test harness
