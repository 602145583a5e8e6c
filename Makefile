.PHONY: tests tests-fast bench lint integration native clean

tests:
	python -m pytest tests/ -q

# quick development loop: skips the @slow end-to-end/zoo tests (`make
# tests` stays exhaustive; CI runs it). On multi-core machines add
# `-n auto` (pytest-xdist) — this container has 1 CPU, where worker
# startup costs more than it saves.
tests-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

# CLI roundtrips on the reference wav fixtures (tiny injected model,
# mirrors the reference Makefile's two integration runs)
integration:
	python -m pytest tests/test_cli_audio.py -q

native:
	$(MAKE) -C encodec_tpu/native

lint:
	python -m flake8 encodec_tpu tests --max-line-length 100 || true

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	$(MAKE) -C encodec_tpu/native clean 2>/dev/null || true
