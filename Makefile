# Build/test/bench targets (parity with the reference Makefile's
# test/lint/convert/release flow, reference: Makefile:24-148 — adapted:
# no cross-compiled binaries to ship, the "build" artifact is the C++
# data-path library).

PY ?= python

.PHONY: all test test-all test-fast lint native bench convert16 convert32 quantize8 quantize4 clean

all: native test

# static hygiene (reference Makefile's ineffassign/staticcheck/misspell/
# govet chain, Makefile:51-99; offline AST-based equivalent)
lint:
	$(PY) scripts/lint.py

# native C++ data-path kernels (checkpoint IO / quantization; loaded via
# ctypes with a numpy fallback, so tests pass without it too)
native:
	$(PY) -m llamago_tpu.native --build

test: lint
	$(PY) -m pytest tests/ -q -m "not slow"

test-all: lint
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -k "not multihost and not chunked"

bench:
	$(PY) bench.py

# converter entry points (reference: Makefile convert16/convert32)
convert16:
	$(PY) -m llamago_tpu.cli convert --model $(MODEL) --out $(OUT) --dtype float16

convert32:
	$(PY) -m llamago_tpu.cli convert --model $(MODEL) --out $(OUT) --dtype float32

# quantizers the reference lacks in-repo (its Makefile shells out to
# llama.cpp's binary, Makefile:132-133)
quantize8:
	$(PY) -m llamago_tpu.cli quantize --model $(MODEL) --out $(OUT) --bits 8

quantize4:
	$(PY) -m llamago_tpu.cli quantize --model $(MODEL) --out $(OUT) --bits 4

clean:
	rm -rf llamago_tpu/native/*.so **/__pycache__ .pytest_cache profile
