"""spark-submit entrypoint training the hashed quality classifier that
``corpus_job --clf-weights`` gates on.

    labeled docs (doc_id, text, label in {0,1})
      -> closed-form hashed-NB training (operators/classifier.py:
         one narrow explode + one bucket agg; no gradient loop)
      -> (bucket, weight) parquet + one JSON line carrying the bias

The printed ``bias`` is the value to pass as ``--clf-bias`` when scoring
(the weights alone are NOT the whole model). Deterministic: same labeled
corpus -> byte-identical weights, so a re-run (or a task retry) cannot
drift the downstream gate.

Cluster:
    scripts/make_pyfiles_zip.sh
    spark-submit --py-files engine.zip scripts/train_classifier.py \
        --labeled /data/labeled --output /models/quality_clf
    spark-submit ... scripts/corpus_job.py --clf-weights /models/quality_clf \
        --clf-bias <bias from the stats line> ...

Local smoke:
    python scripts/train_classifier.py --labeled <parquet> --output /tmp/w
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--labeled", required=True,
                    help="parquet dir of (doc_id, text, label in {0,1}) rows")
    ap.add_argument("--output", required=True,
                    help="weights parquet dir (bucket, weight)")
    ap.add_argument("--n-buckets", type=int, default=1 << 15,
                    help="feature-hash bucket count (scoring must match)")
    ap.add_argument("--smoothing", type=float, default=1.0,
                    help="Laplace smoothing alpha")
    ap.add_argument("--no-bigrams", action="store_true",
                    help="train on word features only (default adds "
                         "space-joined bigrams, fastText wordNgrams=2)")
    ap.add_argument("--cpus", type=int, default=0, help="local[] width (0 = all)")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from timeseriesvectordbpattermatcher_spark.operators.classifier import (
        train_nb_weights,
    )
    from timeseriesvectordbpattermatcher_spark.session import get_spark

    spark = get_spark(app_name="train_classifier", cpus=args.cpus or None)
    t0 = time.time()
    labeled = spark.read.parquet(args.labeled)
    weights, bias = train_nb_weights(
        labeled,
        n_buckets=args.n_buckets,
        bigrams=not args.no_bigrams,
        smoothing=args.smoothing,
    )
    weights.write.mode("overwrite").parquet(args.output)
    out = spark.read.parquet(args.output)
    print(json.dumps({
        "bias": bias,
        "n_buckets": args.n_buckets,
        "buckets_learned": out.count(),
        "labeled_rows": labeled.count(),
        "output": args.output,
        "wall_sec": round(time.time() - t0, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
