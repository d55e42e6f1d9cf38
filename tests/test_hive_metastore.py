"""True Hive-metastore path (X16 fidelity): enableHiveSupport + embedded
Derby. Runs in a subprocess because spark.sql.catalogImplementation is
static per JVM and the main test session uses the in-memory catalog."""

from __future__ import annotations

import subprocess
import sys
import textwrap


def test_extractor_against_real_hive_metastore(tmp_path):
    script = textwrap.dedent(f"""
        import sys; sys.path.insert(0, "/root/repo")
        import os
        os.chdir({str(tmp_path)!r})   # derby metastore_db lands here
        from pyspark.sql import SparkSession
        spark = (SparkSession.builder.master("local[2]")
                 .config("spark.sql.warehouse.dir", {str(tmp_path / "wh")!r})
                 .config("spark.ui.enabled", "false")
                 .enableHiveSupport().getOrCreate())
        spark.sparkContext.setLogLevel("ERROR")
        assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
        spark.sql("CREATE DATABASE hv")
        spark.sql("CREATE TABLE hv.t (a INT, dt STRING) PARTITIONED BY (dt) STORED AS PARQUET")
        spark.sql("INSERT INTO hv.t PARTITION (dt='x') VALUES (1)")
        spark.sql("INSERT INTO hv.t PARTITION (dt='y') VALUES (2)")
        from hive_ddl_extract_tool_spark.catalog.extractor import ExtractConfig, extract_ddl
        add = extract_ddl(spark, "hv", "*", None, ExtractConfig(use_add_sql=True))
        assert "CREATE TABLE hv.t" in add.replace("`", "")
        assert "ROW FORMAT SERDE" in add            # Hive-format fidelity (AS SERDE)
        assert add.count("ADD PARTITION") == 2
        msck = extract_ddl(spark, "hv", "*", None, ExtractConfig(use_add_sql=False))
        assert "MSCK REPAIR TABLE t;" in msck

        # Migration round-trip FIXPOINT -- the tool's entire purpose: apply
        # the generated script (db renamed, as a cluster migration would) and
        # re-extract; the scripts must match modulo db name and the
        # transient_lastDdlTime DDL timestamp. This proves the script is
        # EXECUTABLE (not just plausible text), the relative partition
        # locations (R11) re-resolve under the new table dir, and extraction
        # is idempotent across a migration hop.
        applied = add.replace("hv", "hv2")
        stmts = [s.strip() for s in "\\n".join(
            ln for ln in applied.splitlines() if not ln.startswith("--")
        ).split(";") if s.strip()]
        for s in stmts:
            spark.sql(s)
        assert [r[0] for r in spark.sql("SHOW PARTITIONS hv2.t").collect()] == ["dt=x", "dt=y"]
        dst = extract_ddl(spark, "hv2", "*", None, ExtractConfig(use_add_sql=True))
        def canon(t, db):
            return "\\n".join(ln for ln in t.replace(db, "DB").splitlines()
                              if "transient_lastDdlTime" not in ln)
        assert canon(add, "hv") == canon(dst, "hv2"), (add, dst)
        print("HIVE_METASTORE_OK")
    """)
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300
    )
    assert "HIVE_METASTORE_OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )
