.PHONY: test test-fast bench bench-csearch native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not operator and not slow"

bench:
	python bench.py

bench-csearch:
	FIRECODE_BENCH_MODE=csearch python bench.py

native:
	python native/build_fastxyz.py

clean:
	rm -rf .pytest_cache __pycache__ firecode_*.log firecode_state_*.npz
	find . -name "__pycache__" -type d -exec rm -rf {} + 2>/dev/null || true
