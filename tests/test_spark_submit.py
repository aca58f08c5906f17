"""The north rule's launch mode, exercised for real: `spark-submit
--py-files ves_spark.zip` from a foreign cwd, with the package
importable ONLY from the zip — proves the repo ships as a
self-contained spark-submit artifact, not just an importable tree."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(dest: str) -> str:
    zpath = os.path.join(dest, "ves_spark.zip")
    pkg = os.path.join(REPO, "ves_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_py_files_end_to_end(tmp_path):
    from ves_spark.synth import write_fixture

    fix = str(tmp_path / "fix")
    write_fixture(fix, 3_000, seed=17)
    zpath = _zip_package(str(tmp_path))
    # the driver script is a COPY in tmp: the package must come from
    # the zip, not from a repo checkout on PYTHONPATH
    script = str(tmp_path / "main.py")
    shutil.copy(os.path.join(REPO, "ves_spark", "__main__.py"), script)

    spark_submit = os.path.join(
        os.path.dirname(os.path.dirname(sys.executable)),
        "lib",
        f"python{sys.version_info.major}.{sys.version_info.minor}",
        "site-packages",
        "pyspark",
        "bin",
        "spark-submit",
    )
    if not os.path.exists(spark_submit):
        spark_submit = "spark-submit"

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_MASTER")
    }
    env["SPARK_GRAFT_CPUS"] = "4"
    out = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[4]",
            "--py-files",
            zpath,
            script,
            "--sequences",
            os.path.join(fix, "sequences.parquet"),
            "--source-meta",
            os.path.join(fix, "source_meta.parquet"),
            "--route-rules",
            os.path.join(fix, "route_rules.parquet"),
            "--out",
            str(tmp_path / "out"),
            "--units",
            "4",
            "--units-per-increment",
            "4",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats_lines = [
        ln for ln in out.stdout.splitlines() if ln.startswith("{")
    ]
    assert stats_lines, out.stdout[-2000:]
    stats = json.loads(stats_lines[-1])
    assert stats["units_processed"] == 4
    assert stats["rows_routed"] > 0
    # output really landed (routed table partitioned by batch/unit/sink)
    routed = os.path.join(str(tmp_path), "out", "routed")
    assert os.path.isdir(routed) and any(
        "sink=" in d for _r, dirs, _f in os.walk(routed) for d in dirs
    )
