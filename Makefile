# Build/test entry points — the analogue of the reference's recursive make
# (reference: Makefile, Rules.mk, source/Makefile, test/Makefile), reshaped
# for a Python/JAX package with one native component.
#
#   make            build the native host core + regenerate the static blinder
#   make native     compile curve25519_tpu/native/libref25519.so (g++)
#   make custom     regenerate the static blinding context (the reference
#                   reruns custom_tool before every build, source/Makefile:31)
#   make test       fast test suite (excludes slow full-kernel compiles)
#   make test-all   full suite, virtual 8-device CPU mesh
#   make bench      headline benchmark (one JSON line, real TPU)
#   make bench-all  full per-config suite (benchmarks/bench_suite.py)

PY ?= python

.PHONY: all native custom test test-all bench bench-all clean

all: native custom

native: curve25519_tpu/native/libref25519.so

curve25519_tpu/native/libref25519.so: curve25519_tpu/native/ref25519.cpp
	g++ -O3 -march=native -shared -fPIC -o $@ $<

custom:
	$(PY) -m curve25519_tpu.tools.custom_tool b

# -n 2: pytest-xdist over both host cores (the suite is XLA-compile-bound);
# --dist loadfile keeps a file's tests on one worker so module-level jitted
# wrappers reuse their traced/compiled graphs. pytest's trailing "in N s"
# line is the fast tier's wall-clock budget check.
# The SLOW tier runs serially, ONE FILE PER PROCESS: its tests compile the
# monster graphs (pallas-interpret whole-protocol kernels, the 8-device
# shard_map pipeline), and XLA:CPU segfaults nondeterministically when
# compiling two of those concurrently OR after many of them accumulate in
# one process (observed at backend_compile_and_load; fresh-process solo
# runs always pass — see tests/conftest.py). pytest exit code 5 = a file
# with no slow tests, which is fine.
test:
	$(PY) -m pytest tests/ -q -m "not slow" -n 2 --dist loadfile

test-all:
	$(PY) -m pytest tests/ -q -m "not slow" -n 2 --dist loadfile
	@for f in tests/test_*.py; do \
	    $(PY) -m pytest -q -m slow $$f; rc=$$?; \
	    [ $$rc -eq 0 ] || [ $$rc -eq 5 ] || exit $$rc; \
	done

bench:
	$(PY) bench.py

bench-all:
	$(PY) benchmarks/bench_suite.py

# per-kernel device timelines via jax.profiler (KERNEL_TRACE artifacts)
bench-trace:
	$(PY) benchmarks/trace_kernels.py

# edge/RFC/selftest vector corpus through the COMPILED kernels on the chip
# (TPU_VECTORS artifacts; exits non-zero on any oracle disagreement)
tpu-vectors:
	$(PY) benchmarks/tpu_vectors.py

# measure the reference library on THIS host -> BASELINE_LOCAL.{md,json}
# (bench_suite reads its vs_baseline columns from the json)
baseline-local:
	$(PY) benchmarks/measure_local_baseline.py

clean:
	rm -f curve25519_tpu/native/libref25519.so
	find . -name __pycache__ -type d -exec rm -rf {} +
