.PHONY: tests tests-fast bench lint typecheck integration native clean

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

# ENFORCING (non-zero exit on violations), mirroring the reference's
# flake8 gate (ref Makefile:5-6). flake8/ruff are not installable in
# this container, so tools/lint.py implements the core rule set on the
# stdlib; when flake8 IS available it runs too (setup.cfg config).
lint:
	python tools/lint.py encodec_tpu tests tools probes examples \
		bench.py __graft_entry__.py
	@if python -c "import flake8" 2>/dev/null; then \
		python -m flake8 encodec_tpu tests tools probes examples; \
	else echo "flake8 not installed; stdlib linter enforced above"; fi

# mypy gate (ref mypy.ini + .github/workflows/linter.yml). mypy is not
# installable in this container: run it where available; fail loudly
# only on violations, not on absence.
typecheck:
	@if python -c "import mypy" 2>/dev/null; then \
		python -m mypy encodec_tpu; \
	else echo "mypy not installed; typecheck skipped (see mypy.ini)"; fi

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	$(MAKE) -C encodec_tpu/native clean 2>/dev/null || true
