"""spark-submit --py-files packaging (north_rule requirement)."""

import os
import shutil
import subprocess
import sys
import textwrap

import pytest

from geomesa_spark.session import package_zip

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files(tmp_path):
    zip_path = package_zip(str(tmp_path))
    driver = tmp_path / "driver.py"
    driver.write_text(
        textwrap.dedent(
            """
            from pyspark.sql import SparkSession

            spark = SparkSession.builder.getOrCreate()
            # the engine must be importable from the --py-files zip
            from geomesa_spark.operators.spatial_join import pip_join_broadcast
            from geomesa_spark.sources.docs import extract_geometry, synth_docs

            docs = synth_docs(spark, 2000)
            pts = extract_geometry(docs)
            out = pip_join_broadcast(
                pts, [("p1", "POLYGON ((-30 -30, 30 -30, 30 30, -30 30, -30 -30))")]
            )
            print("RESULT_ROWS=%d" % out.count())
            spark.stop()
            """
        )
    )
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            str(driver),
        ],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT_ROWS=")]
    assert line and int(line[0].split("=")[1]) > 0
