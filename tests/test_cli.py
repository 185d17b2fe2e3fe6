"""CLI entry point (clearcare_data_pipeline_spark.__main__)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clearcare_data_pipeline_spark.__main__ import main  # noqa: E402


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "q1_pricing_summary" in out and len(out) >= 130


def test_cli_unknown_query(capsys):
    assert main(["run", "definitely_not_a_query"]) == 2
    assert "unknown query" in capsys.readouterr().err
