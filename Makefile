# Convenience targets (the reference's build layer is per-directory Makefiles
# compiling SWIG modules; here the native codec builds itself on demand via
# ctypes, so these targets just wrap the common workflows).

PY ?= python

.PHONY: test test-fast native bench clean

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -k "not pipeline and not bench_drivers"

native:
	$(PY) -c "from vector_db_id_compression_tpu import native; \
	          assert native.available(), 'toolchain missing'; print('native ok')"

bench:
	$(PY) bench.py

clean:
	rm -f vector_db_id_compression_tpu/native/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
