"""Runnable walkthrough: marketing/graph analytics — the round-10
batch-B operator family composed end to end.

    python examples/marketing_analytics.py [sf_dir] [out_dir]

Steps: U-shaped multi-touch attribution of purchase value over the
event stream → first-touch-to-conversion latency → RFM quintile
segmentation of the customer base (one fused global_ntile_multi
pass — all three orderings in a single range shuffle) → revenue-concentration diagnostics (Gini + Lorenz deciles in
exact cents, Benford first-digit screen) → the part co-occurrence
GRAPH: degree histogram and degree-ordered triangle counts, ending
with the most "embedded" parts (highest triangle participation — the
items whose neighborhoods are themselves interconnected, the classic
cross-sell nucleus).

Every step writes parquet to out_dir and prints a one-screen summary.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_streaming_kafka_spark import get_spark
from spark_streaming_kafka_spark.operators.behavior import (
    behavioral_entropy,
    position_attribution,
    rfm_scores,
    time_to_conversion,
)
from spark_streaming_kafka_spark.operators.graph import (
    degree_histogram,
    triangle_counts,
)
from spark_streaming_kafka_spark.operators.profiling import (
    benford_first_digit,
    gini_coefficient,
    lorenz_deciles,
)
from spark_streaming_kafka_spark.queries import _cooc_edges
from spark_streaming_kafka_spark.sources.readers import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="marketing_analytics_"
    )
    spark = get_spark("marketing_analytics")
    spark.sparkContext.setLogLevel("ERROR")
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    # 1. Which channel actually drove purchase revenue?
    attr = position_attribution(events)
    attr.write.mode("overwrite").parquet(f"{out_dir}/attribution")
    for r in attr.collect():
        print(f"[1] attribution: {r['event_type']:>6} -> "
              f"{round(r['credited_value'], 2)} over {r['n_touches']} touches")

    # 2. How long from first view to first purchase?
    ttc = time_to_conversion(events)
    ttc.write.mode("overwrite").parquet(f"{out_dir}/time_to_conversion")
    med = ttc.agg(F.expr("percentile(latency_s, 0.5)")).first()[0]
    print(f"[2] conversion latency: {ttc.count()} converting users, "
          f"median {round(med or 0.0, 1)} s")

    # 3. RFM segmentation (distributed global ntiles — no
    #    single-partition window).
    rfm = rfm_scores(orders)
    rfm.write.mode("overwrite").parquet(f"{out_dir}/rfm")
    champions = rfm.filter("r_score >= 4 AND f_score >= 4 AND m_score >= 4")
    print(f"[3] rfm: {rfm.count()} customers, {champions.count()} champions "
          f"(R>=4, F>=4, M>=4)")

    # 4. Revenue concentration + data-quality screens.
    cents = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("x")
    )
    g = gini_coefficient(cents, "k", "x").first()
    print(f"[4] gini: {round(g['gini'], 4)} across {g['n_keys']} customers")
    lorenz = lorenz_deciles(cents, "k", "x")
    lorenz.write.mode("overwrite").parquet(f"{out_dir}/lorenz")
    bottom5 = (
        lorenz.filter("tile = 5").first()["cum_share"]
        if lorenz.filter("tile = 5").count()
        else 0.0
    )
    print(f"[4] lorenz: bottom half of customers holds "
          f"{round(100 * bottom5, 1)}% of revenue")
    benford = benford_first_digit(orders, "o_totalprice")
    chi2 = benford.agg(F.sum("chi2_term")).first()[0]
    print(f"[4] benford: chi2 stat {round(chi2, 6)} over 9 digits")

    # 5. Behavioral diversity (entropy of each user's event mix).
    ent = behavioral_entropy(events)
    ent.write.mode("overwrite").parquet(f"{out_dir}/entropy")
    avg_h = ent.agg(F.avg("entropy_bits")).first()[0]
    print(f"[5] entropy: {ent.count()} users, mean {round(avg_h, 3)} bits")

    # 6. The co-occurrence graph: shape, then triangles.
    edges = _cooc_edges(spark, sf_dir)
    hist = degree_histogram(edges, "id_a", "id_b")
    hist.write.mode("overwrite").parquet(f"{out_dir}/degree_histogram")
    n_nodes = hist.agg(F.sum("n_nodes")).first()[0]
    print(f"[6] graph: {edges.count()} edges over {n_nodes} parts")
    tri = triangle_counts(edges, "id_a", "id_b")
    tri.write.mode("overwrite").parquet(f"{out_dir}/triangles")
    top = tri.orderBy(F.desc("n_triangles"), F.asc("node")).limit(3).collect()
    print("[6] most embedded parts: "
          + ", ".join(f"{r['node']} ({r['n_triangles']} triangles)" for r in top))

    print(f"done -> {out_dir}")


if __name__ == "__main__":
    main()
