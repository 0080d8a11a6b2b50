"""spark-submit --py-files packaging smoke (north-rule production shape).

The cluster submission story (`README.md` "Running") is:

    zip -qr pipeline.zip pipeline
    spark-submit --py-files pipeline.zip main.py --input ... --output ...

This test proves the zip is self-sufficient: ``main.py`` is copied into
an empty temp directory (so the driver CANNOT import ``pipeline`` from
the repo checkout via the script-dir sys.path entry) and submitted with
only the zip on ``--py-files``. Both the driver imports and the Arrow
worker closures (scoring kernels, synth generator) must resolve through
the zip — exactly what a real multi-executor cluster requires.

A second submit against the same output dir exercises resume through
the spark-submit surface (every stage reports ``resumed: true``, same
cluster count and CC checksum).
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

SPARK_SUBMIT = shutil.which("spark-submit")


def _build_zip(dest: Path) -> Path:
    """Zip the pipeline package the way README documents (zip -qr)."""
    zpath = dest / "pipeline.zip"
    pkg = REPO / "pipeline"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(pkg.rglob("*.py")):
            z.write(f, f.relative_to(REPO))
    return zpath


def _submit(workdir: Path, zpath: Path, out: Path) -> dict:
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[8]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", str(zpath),
            str(workdir / "main.py"),
            "--synthetic", "40",
            "--output", str(out),
        ],
        cwd=workdir,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-4000:]}"
    # stdout is one JSON report line (log4j noise goes to stderr)
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_isolated(tmp_path):
    workdir = tmp_path / "iso"
    workdir.mkdir()
    shutil.copy(REPO / "main.py", workdir / "main.py")
    zpath = _build_zip(workdir)
    out = tmp_path / "run"

    rep = _submit(workdir, zpath, out)
    assert rep["docs"] > 0 and rep["clusters"] > 0
    stages = {s["stage"]: s for s in rep["stages"]}
    assert not any(s.get("resumed") for s in rep["stages"])
    cc = stages["cc"]

    # resume through the same submit surface: byte-identical state
    rep2 = _submit(workdir, zpath, out)
    assert rep2["clusters"] == rep["clusters"]
    assert rep2["pairs_matched"] == rep["pairs_matched"]
    for s in rep2["stages"]:
        if s["stage"] == "cc":
            assert s["checksum"] == cc["checksum"]
        else:
            assert s.get("resumed") is True, f"stage {s['stage']} recomputed"
    assert rep2["wall_s"] < rep["wall_s"]


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_main_py_has_no_repo_relative_imports():
    """main.py must import only stdlib + pyspark + the shipped package —
    anything else breaks the --py-files contract. Static check so the
    constraint survives refactors without another 30s submit."""
    import ast

    tree = ast.parse((REPO / "main.py").read_text())
    roots = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            roots.update(a.name.split(".")[0] for a in node.names)
        elif isinstance(node, ast.ImportFrom) and node.level == 0:
            roots.add((node.module or "").split(".")[0])
        elif isinstance(node, ast.ImportFrom) and node.level > 0:
            pytest.fail("relative import in main.py breaks spark-submit")
    allowed = {
        "argparse", "dataclasses", "json", "sys", "time", "os", "pathlib",
        "shutil", "pyspark", "pipeline", "__future__", "hashlib",
    }
    assert roots <= allowed, f"unexpected imports in main.py: {roots - allowed}"


def test_cli_profile_reaches_hot_key_star():
    """--profile production / --hot-key-star must actually reach the
    MatchConfig main() builds (round-5 review: PRODUCTION_CONFIG
    documented 'production runs enable it' but the CLI could only build
    DEFAULT_CONFIG, leaving the mega-dup skew defense unreachable from
    the documented spark-submit path). Exercises main.build_config —
    the exact function main() calls — without starting Spark."""
    from main import build_config, parse_args

    def cfg(argv):
        return build_config(
            parse_args(argv + ["--output", "/tmp/x", "--synthetic", "1"])
        )

    assert cfg([]).hot_key_star is False
    assert cfg(["--profile", "production"]).hot_key_star is True
    assert cfg(["--profile", "production"]).hash_impl == "xxhash64"
    assert cfg(["--hot-key-star"]).hot_key_star is True
    # an explicit hash override still applies on the production base
    assert cfg(["--profile", "production", "--hash-impl", "md5"]).hash_impl == "md5"
