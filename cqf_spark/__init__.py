"""cqf_spark — PySpark-native counting-quotient-filter + sketch library."""

import os

# Large numpy buffers must come from reusable heap memory, not fresh mmaps:
# glibc's default trim/mmap behavior returns big buffers to the kernel on
# free, so vectorized hot loops re-fault new pages every batch.  On hosts
# with lazily-backed memory (VM snapshots, ballooning) a first touch costs
# ~1ms/page and this is a 100x slowdown; on any host it saves page-fault
# churn.  Must be set before child processes (Spark python workers) start;
# setdefault so operators can override.
for _k, _v in (
    ("MALLOC_MMAP_THRESHOLD_", "1073741824"),
    ("MALLOC_TRIM_THRESHOLD_", "-1"),
    ("MALLOC_ARENA_MAX", "4"),
):
    os.environ.setdefault(_k, _v)
