"""Bare-worker driver-contract sweep.

The grading driver imports ``__spark_entry__`` by file path from its
OWN working directory: the repo is importable on the DRIVER (it puts
the file's directory on sys.path) but NOT inside the Python workers
Spark forks — those inherit the driver process's cwd and environment,
where the repo package is absent. Any mapInPandas / applyInPandas /
pandas_udf closure that references a module-level name from this
package therefore pickles BY MODULE PATH and dies on the worker with
``ModuleNotFoundError: market_data_ingestor_go_spark`` — but only
under the driver's contract, never under pytest (whose cwd IS the
repo, so '' on the worker's sys.path resolves the package).

Found live in round 8: ``assign_cells``'s kernel closure called the
module-level ``_fold_dot_rows`` and every consumer (semdedup,
semdedup_keepers, the streaming gate) failed from a /tmp session while
the whole local suite stayed green. Closures must either be
self-contained (nested defs, data captured by value) or their module
registered via ``pyspark.cloudpickle.register_pickle_by_value`` (the
media-codec pattern, operators/multimodal.py:51-56).

This test reproduces the contract exactly: a subprocess whose cwd is
a temp dir and whose PYTHONPATH cannot see the repo runs EVERY
registered query rows-only at sf0.001. ~2 min; it is the only local
gate for this failure class, so it stays in the default run.
"""
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SWEEP = """
import sys
sys.path.insert(0, {repo!r})   # driver-side import only; workers can't see it
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "America/New_York")
         .config("spark.ui.enabled", "false").getOrCreate())
from market_data_ingestor_go_spark.plans.queries import ALL_QUERIES
# r16 suite budget (guide ss2.6 "overlap independent jobs"): the 210
# rows-only counts are independent driver actions — 4 driver threads
# back-fill each job's straggler tail with the next job's tasks.
# Coverage is UNCHANGED: every query still executes through bare
# workers; query construction (which mutates session state for the
# memoized families) stays serialized under a lock.
from concurrent.futures import ThreadPoolExecutor
import threading
build_lock = threading.Lock()
def sweep_one(item):
    name, fn = item
    try:
        with build_lock:
            df = fn(spark, "/root/testdata/sf0.001")
        df.count()
        return None
    except Exception as e:
        return (name, str(e).splitlines()[0][:200])
with ThreadPoolExecutor(max_workers=4) as pool:
    fails = [f for f in pool.map(sweep_one, ALL_QUERIES.items()) if f]
for name, msg in fails:
    print(f"FAIL {{name}} {{msg}}", flush=True)
print(f"SWEPT {{len(ALL_QUERIES)}} FAILS {{len(fails)}}", flush=True)
sys.exit(1 if fails else 0)
"""


def test_all_queries_survive_bare_workers():
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    with tempfile.TemporaryDirectory() as tmp:
        proc = subprocess.run(
            [sys.executable, "-c", SWEEP.format(repo=REPO)],
            cwd=tmp, env=env, capture_output=True, text=True,
            timeout=1200)
    tail = "\n".join(proc.stdout.splitlines()[-30:])
    assert proc.returncode == 0, (
        f"bare-worker sweep failed:\n{tail}\n"
        f"stderr tail:\n{proc.stderr[-2000:]}")
    assert "FAILS 0" in proc.stdout, tail
