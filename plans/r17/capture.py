"""Capture .explain('formatted') for a list of registry keys into
plans/r17/<key>_<tag>.txt. Usage:
    python plans/r17/capture.py <tag> [key ...]
With no keys listed, captures every headline + extended bench key.
Streaming keys execute on build (their fn runs the stream); their plan is
the sink-table scan, still captured for completeness.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from contextlib import redirect_stdout

from bench import EXTENDED, HEADLINE
from spark_sql_dsv2_extension_spark.registry import load_all
from spark_sql_dsv2_extension_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    keys = sys.argv[2:] or (HEADLINE + EXTENDED)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    specs = load_all()
    spark = get_spark("plan_capture")
    for key in keys:
        spec = specs.get(key)
        if spec is None:
            print(f"SKIP {key}: not registered", file=sys.stderr)
            continue
        try:
            df = spec.fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{key}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"OK   {key}", file=sys.stderr)
        except Exception as e:  # capture everything it can; report the rest
            print(f"FAIL {key}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
