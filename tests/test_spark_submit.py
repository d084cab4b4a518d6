"""spark-submit --py-files packaging, end-to-end (north rule: the engine
ships as a spark-submit --py-files job).

The job runs in a SEPARATE JVM with cwd OUTSIDE the repo, so the library
import can only be satisfied by the zip shipped via --py-files — this test
fails if the package misses files or relies on repo-relative state.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_job(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from build_pyfiles import build

    zip_path = build(str(tmp_path / "ftval.zip"))
    # determinism: rebuilding yields byte-identical artifacts
    zip2 = build(str(tmp_path / "ftval2.zip"))
    assert open(zip_path, "rb").read() == open(zip2, "rb").read()

    src = str(tmp_path / "pages.parquet")
    pd.DataFrame({
        "url": ["u1", "u2", "u2", "u3"],
        "lang": ["en", "de", "en", "xx"],   # xx violates the enum
    }).to_parquet(src)
    schema_file = tmp_path / "schema.json"
    schema_file.write_text(json.dumps({
        "$id": "pages/1.0", "primary_key": ["url"],
        "properties": {"lang": {"enum": ["en", "de"]}},
    }))
    out = str(tmp_path / "out")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import source
    env["SPARK_GRAFT_CPUS"] = "4"
    proc = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_validate.py"),
         "validate", "--input", src, "--schema", str(schema_file),
         "--out", out, "--key-col", "url", "--partitions", "2",
         "--run-id", "submit-test"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420,
    )
    assert proc.returncode == 1, proc.stderr[-3000:]  # violations ⇒ exit 1
    lines = [json.loads(ln) for ln in proc.stdout.strip().splitlines()
             if ln.startswith("{")]
    totals = lines[-1]
    assert totals["rows"] == 4
    assert totals["violations"] == 2  # dup url u2 + enum violation u3
