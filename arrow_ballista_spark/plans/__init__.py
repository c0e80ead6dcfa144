"""Plan surface: EXPLAIN modes + plan-shape report (:mod:`.explain`),
per-operator SQLMetrics (:mod:`.metrics`), graphviz export (:mod:`.dot`)."""

from arrow_ballista_spark.plans.explain import plan_report  # noqa: F401
