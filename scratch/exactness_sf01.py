"""Bit-exactness sweep at sf0.1 with MULTI-SPLIT scans.

Forces small file-split sizes so every parquet scan fans out over many
partitions — if any aggregate were float-order-dependent, partial
aggregation across splits would flip low bits and this sweep would
catch it (the sf0.01 sweep reads most tables as one split, which can
mask order dependence).  Expect "NONE — all N bit-exact".
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from exactness import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(
        main(
            "/root/testdata/sf0.1",
            spark_conf={
                "spark.sql.files.maxPartitionBytes": "1m",
                "spark.sql.files.openCostInBytes": "0",
            },
            only=sys.argv[1:] or None,
        )
    )
