"""Session-scoped scratch root: allocated lazily, unique per process,
removed at interpreter exit (VERDICT r2 item 8 — repeated check_parity runs
must leave no /tmp litter). No Spark needed."""

import os
import subprocess
import sys


def test_scratch_dirs_share_one_root_and_tag_is_stable():
    from ltss_spark.scratch import scratch_dir, session_tag

    a, b = scratch_dir("x"), scratch_dir("x")
    assert a != b, "per-call paths must be unique"
    assert os.path.dirname(a) == os.path.dirname(b), "one session root"
    assert os.path.isdir(os.path.dirname(a)), "root exists"
    assert not os.path.exists(a), "allocation does not pre-create the dir"
    assert session_tag() == session_tag(), "tag stable within the session"
    assert session_tag() in os.path.dirname(a)


def test_scratch_root_removed_at_exit():
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import os; from ltss_spark.scratch import scratch_dir; "
            "p = scratch_dir('probe'); os.makedirs(p); "
            "open(os.path.join(p, 'f'), 'w').write('x'); "
            "print(os.path.dirname(p))",
        ],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        check=True,
    )
    root = out.stdout.strip().splitlines()[-1]
    assert root.startswith("/tmp") or "ltss_scratch_" in root
    assert not os.path.exists(root), "scratch root must be removed at exit"


def test_load_table_cache_invalidates_on_rewrite(spark, tmp_path):
    """The DataFrame-handle cache must serve the SAME handle for an
    unchanged file and a FRESH one (new data visible) after the file is
    rewritten — keyed by (appId, path, mtime, size)."""
    import os
    import shutil

    from ltss_spark.sources.batch import load_table

    sf = str(tmp_path)
    src = "/root/testdata/sf0.001/nation.parquet"
    dst = f"{sf}/nation.parquet"
    shutil.copyfile(src, dst)

    df1 = load_table(spark, sf, "nation")
    n1 = df1.count()
    assert load_table(spark, sf, "nation") is df1  # cache hit, same handle

    rows = spark.read.parquet(src).limit(3)
    rows.write.mode("overwrite").parquet(f"{sf}/tmp_nation")
    # single-file replace with different mtime/size
    part = [f for f in os.listdir(f"{sf}/tmp_nation") if f.endswith(".parquet")][0]
    os.remove(dst)
    shutil.copyfile(f"{sf}/tmp_nation/{part}", dst)
    os.utime(dst, (1_700_000_000, 1_700_000_000))

    df2 = load_table(spark, sf, "nation")
    assert df2 is not df1
    assert df2.count() == 3 != n1


def test_register_views_skips_repeat_and_follows_rewrite(spark, tmp_path):
    """The temp-view cache must (a) skip the catalog RPC when the SAME
    table handle is already registered under this session, and (b)
    re-register — making new data visible to SQL — when a fixture rewrite
    gives load_table a fresh handle."""
    import os
    import shutil

    from ltss_spark.plans.registry import _VIEWS, register_views

    sf = str(tmp_path)
    src = "/root/testdata/sf0.001/nation.parquet"
    dst = f"{sf}/nation.parquet"
    shutil.copyfile(src, dst)

    register_views(spark, sf, "nation")
    n1 = spark.sql("SELECT count(*) AS n FROM nation").collect()[0]["n"]
    handle1 = _VIEWS[(spark, "nation")]
    register_views(spark, sf, "nation")
    assert _VIEWS[(spark, "nation")] is handle1  # repeat call: no re-register

    rows = spark.read.parquet(src).limit(2)
    rows.write.mode("overwrite").parquet(f"{sf}/tmp_nation")
    part = [f for f in os.listdir(f"{sf}/tmp_nation") if f.endswith(".parquet")][0]
    os.remove(dst)
    shutil.copyfile(f"{sf}/tmp_nation/{part}", dst)
    os.utime(dst, (1_700_000_001, 1_700_000_001))

    register_views(spark, sf, "nation")
    assert _VIEWS[(spark, "nation")] is not handle1
    n2 = spark.sql("SELECT count(*) AS n FROM nation").collect()[0]["n"]
    assert n2 == 2 != n1
