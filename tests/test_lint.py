"""The stdlib linter gate (tools/lint.py) — including the annotation-
sanity floor that stands in for mypy on containers without it
(VERDICT r4 #7): the typecheck gate must not be a no-op, so undefined
annotation names, typing-attribute typos, broken forward annotations,
and `no_type_check` escapes must all be rejected."""

import os
import subprocess
import sys
import textwrap

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from tools.lint import check_file  # noqa: E402


def _violations(tmp_path, source):
    f = tmp_path / "probe.py"
    f.write_text(textwrap.dedent(source))
    return [msg for (_, _, msg) in check_file(f)]


def _codes(msgs):
    return {m.split()[0] for m in msgs}


def test_clean_annotated_module_passes(tmp_path):
    msgs = _violations(tmp_path, """\
        import typing as tp

        def f(x: tp.Optional[int], y: "Helper") -> tp.List[int]:
            return [x or 0]

        class Helper:
            field: tp.Dict[str, int]
    """)
    assert msgs == []


def test_undefined_annotation_name_flagged(tmp_path):
    msgs = _violations(tmp_path, """\
        def f(x: NoSuchType) -> int:
            return 0
    """)
    assert "TC001" in _codes(msgs), msgs


def test_typing_attribute_typo_flagged(tmp_path):
    msgs = _violations(tmp_path, """\
        import typing as tp

        def f(x: tp.Optinal[int]) -> int:
            return x
    """)
    assert "TC002" in _codes(msgs), msgs


def test_broken_forward_annotation_flagged(tmp_path):
    msgs = _violations(tmp_path, """\
        def f(x: "int [oops") -> int:
            return 0
    """)
    assert "F722" in _codes(msgs), msgs


def test_no_type_check_escape_flagged(tmp_path):
    msgs = _violations(tmp_path, """\
        import typing as tp

        @tp.no_type_check
        def f(x):
            return x
    """)
    assert "TC003" in _codes(msgs), msgs


def test_forward_annotation_names_resolved(tmp_path):
    # names inside string annotations participate in TC001
    msgs = _violations(tmp_path, """\
        def f(x: "Nowhere") -> int:
            return 0
    """)
    assert "TC001" in _codes(msgs), msgs


def test_noqa_suppresses_annotation_rules(tmp_path):
    msgs = _violations(tmp_path, """\
        def f(x: NoSuchType) -> int:  # noqa: TC001
            return 0
    """)
    assert "TC001" not in _codes(msgs), msgs


def test_repo_is_lint_clean():
    """The enforcing gate (`make lint`) passes on the repo itself —
    including the annotation floor over the whole package."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "tools", "lint.py"),
         "encodec_tpu", "tools", "bench.py", "__graft_entry__.py"],
        cwd=REPO_ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout[-3000:]
