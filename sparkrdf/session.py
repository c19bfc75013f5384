"""Session helpers: make the package importable on executors + tuned defaults.

Pandas UDFs reference module-level functions, which cloudpickle serializes *by
reference* — executors must be able to ``import sparkrdf``. Under
``spark-submit --py-files sparkrdf.zip`` that's automatic; for interactive /
driver-embedded use, :func:`ensure_pyfiles` ships the package to executors via
``sc.addPyFile`` (idempotent per application).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set[str] = set()


def package_zip(path: str | None = None) -> str:
    """Zip the sparkrdf package (sources only) for --py-files / addPyFile."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if path is None:
        path = os.path.join(tempfile.gettempdir(), "sparkrdf-pyfiles.zip")
    srcs = []
    for root, _dirs, files in os.walk(pkg_dir):
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                rel = os.path.join("sparkrdf", os.path.relpath(full, pkg_dir))
                srcs.append((full, rel))
    newest = max(os.path.getmtime(s) for s, _ in srcs)
    if not os.path.exists(path) or os.path.getmtime(path) < newest:
        tmp = path + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for full, rel in srcs:
                z.write(full, rel)
        os.replace(tmp, path)
    return path


def ensure_pyfiles(spark) -> None:
    """Ship the package to executors once per application (no-op afterwards)."""
    sc = spark.sparkContext
    app = sc.applicationId
    if app in _SHIPPED:
        return
    try:
        sc.addPyFile(package_zip())
    except Exception:
        # already added with a different path, or a cluster that forbids it —
        # --py-files at submit time is the production path anyway
        pass
    _SHIPPED.add(app)


def _shm_has_headroom(min_free_bytes: int = 8 << 30) -> bool:
    """tmpfs is capped (~50% RAM): redirecting shuffle/spill there without a
    capacity check trades disk-speed wins for no-space-left failures. Only
    use /dev/shm when it has real headroom; SPARKRDF_NO_SHM=1 opts out."""
    try:
        st = os.statvfs("/dev/shm")
        return st.f_bavail * st.f_frsize >= min_free_bytes
    except OSError:
        return False


def get_spark(app_name: str = "sparkrdf", master: str | None = None, **extra_conf):
    """Opinionated local/session builder with the scale-oriented defaults:
    AQE (incl. skew-join splitting), sane shuffle partitioning, Arrow enabled.
    """
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.driver.memory", os.environ.get("SPARKRDF_DRIVER_MEM", "8g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches amortize the per-batch Python handoff (worker
        # dispatch, factorize setup) in the hash/NER UDFs — the measured
        # residual in the 2→8-core scaling gap (BENCH.md); 64k string rows
        # is still only ~10-20 MB per batch
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.shuffle.partitions", str(max(2 * cpus, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    # Local mode only: shuffle/spill to tmpfs when available. A single
    # shared disk is an Amdahl term that caps multi-core scaling; RAM-backed
    # scratch scales with cores. Real clusters manage SPARK_LOCAL_DIRS
    # themselves (per-node SSD arrays), so never override there.
    is_local = (master or "").startswith("local") or (
        not master and not os.environ.get("SPARK_MASTER")
    )
    if (
        is_local
        and "spark.local.dir" not in extra_conf
        and not os.environ.get("SPARKRDF_NO_SHM")
        and os.access("/dev/shm", os.W_OK)
        and _shm_has_headroom()
    ):
        shm = "/dev/shm/sparkrdf-local"
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ensure_pyfiles(spark)
    return spark
