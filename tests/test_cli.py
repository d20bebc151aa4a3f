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


def test_id_list_circle(capsys):
    """id_list prints the README example cover (README.md:42-47) in both id
    and range form, print_ids-identical formatting."""
    from spatialindex_ray import cli

    rc = cli.main(["id_list", "circle", "129.4", "43.7", "0.5", "-l", "7"])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    assert out == ["245093", "245098", "245100", "245105", "245110", "245118"]
    rc = cli.main(["id_list", "circle", "129.4", "43.7", "0.5", "-l", "7", "-r"])
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 0
    assert out[0].split() == ["245093", "245093"]
    # decimal rendering matches kernels.htm.id_to_dec
    from spatialindex_ray.kernels import htm as htmk

    rc = cli.main(["id_list", "circle", "129.4", "43.7", "0.5", "-l", "7", "-d"])
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == str(int(htmk.id_to_dec(245093)))
    # level validation (id_list.c:42-52)
    rc = cli.main(["id_list", "circle", "1", "2", "3", "-l", "99"])
    assert rc == 1
    assert capsys.readouterr().out.startswith("ERROR: ")


def test_tree_count_exact_and_estimate(ray_session, tmp_path, capsys):
    """tree_count exact count + --estimate bounds agree (min <= exact <= max),
    print_count/print_range formats."""
    import os

    from spatialindex_ray import cli, pipelines
    from spatialindex_ray.sources import webpages

    src = str(tmp_path / "src")
    webpages.synth_webpages(2000, hot_frac=0.0).write_parquet(src)
    files = sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )
    out_dir = str(tmp_path / "idx")
    pipelines.build.build_index(files, out_dir, shard_size=4)

    rc = cli.main(["tree_count", out_dir, "circle", "83.2", "12.5", "30.0"])
    out = capsys.readouterr().out.strip()
    assert rc == 0
    exact = int(out.split('count="')[1].split('"')[0])
    rc = cli.main(
        ["tree_count", out_dir, "circle", "83.2", "12.5", "30.0", "--estimate", "--json"]
    )
    out = capsys.readouterr().out.strip()
    assert rc == 0
    import json as _json

    est = _json.loads(out)
    assert est["stat"] == "OK"
    assert est["min"] <= exact <= est["max"]
    assert est["min"] > 0
    # hull shape + estimate reuses the cached count table
    rc = cli.main(
        ["tree_count", out_dir, "hull", "60", "-10", "80", "-10", "80", "10",
         "60", "10", "-e"]
    )
    out = capsys.readouterr().out.strip()
    assert rc == 0 and out.startswith('[struct stat="OK", min=')


def test_build_index_cli(ray_session, tmp_path, capsys):
    import os

    from spatialindex_ray import cli
    from spatialindex_ray.sources import webpages

    src = str(tmp_path / "src")
    webpages.synth_webpages(1500, hot_frac=0.0).write_parquet(src)
    files = sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )
    out = str(tmp_path / "idx")
    rc = cli.main(["build_index", out, *files, "--ranged", "--partitions", "8"])
    line = capsys.readouterr().out.strip()
    assert rc == 0 and 'stat="OK"' in line and "rows=1500" in line
    # tree_count over the freshly built ranged index
    rc = cli.main(["tree_count", out, "circle", "83.2", "12.5", "45.0", "-j"])
    out_line = capsys.readouterr().out.strip()
    assert rc == 0
    import json as _json

    assert _json.loads(out_line)["count"] >= 0
