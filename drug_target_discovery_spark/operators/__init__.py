from drug_target_discovery_spark.operators.correlation import (  # noqa: F401
    pairwise_pearson,
)
