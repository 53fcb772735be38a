# Convenience targets (see README / CLAUDE.md for details)
.PHONY: test bench verify native clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

verify:
	python __graft_entry__.py 8

native:
	cc -O2 -shared -fPIC multiphase_lbm_tpu/io/native/vtkfmt.c \
	  -o multiphase_lbm_tpu/io/native/_vtkfmt.so

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; \
	rm -f multiphase_lbm_tpu/io/native/_vtkfmt.so
