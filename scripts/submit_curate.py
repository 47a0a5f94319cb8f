"""Top-level launcher for spark-submit (relative imports don't work when a
module file is submitted directly):

    zip -r pdfparse_spark.zip pdfparse_spark
    spark-submit --py-files pdfparse_spark.zip scripts/submit_curate.py \\
        --sf-dir <dir with documents.parquet> --out <dir> [--pairs minhash]

Flags are identical to ``python -m pdfparse_spark.pipeline.run_curate``.
"""

from __future__ import annotations

import sys

from pdfparse_spark.pipeline.run_curate import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
