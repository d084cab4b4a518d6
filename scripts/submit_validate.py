"""spark-submit job file — the cluster entry point.

    spark-submit --py-files ftval.zip scripts/submit_validate.py \
        validate --input s3://bucket/pages --schema schemas/pages.json \
        --out s3://bucket/runs/r1 --key-col url --partitions 4096

The library itself arrives via --py-files (built by scripts/
build_pyfiles.py); this file only dispatches into the packaged CLI, so the
same arguments work locally (`python -m fairtracks_validator_spark.cli`)
and on a cluster. Exit code: non-zero when violations exist (reference CLI
semantics, ``FairGTrackValidatorCli.java:364-385``).
"""

import sys

from fairtracks_validator_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
