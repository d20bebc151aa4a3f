"""CLI compat surface: byte-identical stdout vs captured reference binary
output (tests/fixtures/cli_golden.json)."""

import contextlib
import io
import json
import os

import pytest

from spatialindex_ray import cli

FIX = json.load(
    open(os.path.join(os.path.dirname(__file__), "fixtures", "cli_golden.json"))
)


@pytest.mark.parametrize(
    "case", [c for c in FIX if c["args"][0] != "index"],
    ids=lambda c: " ".join(c["args"][:4]),
)
def test_cli_byte_identical(case):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(case["args"])
    assert buf.getvalue() == case["stdout"]
    assert rc == case["returncode"]


def test_cli_index_byte_identical(tmp_path):
    case = [c for c in FIX if c["args"][0] == "index"][0]
    inp = tmp_path / "in.csv"
    outp = tmp_path / "out.csv"
    inp.write_text(case["csv_in"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = cli.main(["index", case["args"][1], str(inp), str(outp)])
    assert rc == case["returncode"]
    assert buf.getvalue() == case["stdout"]
    assert outp.read_text() == case["csv_out"]
