"""north_rule packaging evidence: the engine runs via
``spark-submit --py-files raven_spark.zip`` (its own JVM, package resolved
from the zip, not the repo checkout)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from package import build

    zip_path = build(str(tmp_path / "raven_spark.zip"))

    import pyarrow as pa
    import pyarrow.parquet as pq

    from raven_spark.sources.corpus import _gen_batch

    pdf = _gen_batch(np.arange(150, dtype=np.uint64), 150, 15, seed=42)
    corpus = str(tmp_path / "corpus.parquet")
    pq.write_table(pa.Table.from_pandas(pdf), corpus,
                   coerce_timestamps="us", allow_truncated_timestamps=True)

    state = str(tmp_path / "state")
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[2]",
         "--conf", "spark.sql.shuffle.partitions=2",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "submit_crawl.py"),
         "--corpus", corpus, "--state", state, "--seeds", "15", "--rounds", "2"],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path),  # NOT the repo: the zip must be the import source
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out["pages"] > 0 and len(out["rounds"]) >= 1
    assert os.path.exists(os.path.join(state, "rounds.json"))
