"""Shell-veneer tests: the CLI verbs (the reference's SnackFSShell
surface) must delegate to the catalog plans and return shell-style exit
codes."""

from __future__ import annotations

from snackfs_spark.__main__ import main
from tests.conftest import SF_ORACLE


def _run(*argv: str) -> int:
    return main(["--sf-dir", SF_ORACLE, "--cpus", "4", *argv])


def test_cli_test_predicates_exit_codes():
    assert _run("test", "-e", "/data/src0") == 0
    assert _run("test", "-d", "/data/src0") == 0
    assert _run("test", "-e", "/data/definitely_missing") == 1


def test_cli_cat_and_ls(capsys):
    assert _run("ls", "/data/src0") == 0
    assert _run("cat", "/data/src0/doc_0.txt") == 0
    out = capsys.readouterr().out
    assert "doc_0.txt" in out and len(out) > 100
    assert _run("cat", "/data/missing.txt") == 1
