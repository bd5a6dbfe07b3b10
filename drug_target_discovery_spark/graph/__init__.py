from drug_target_discovery_spark.graph.centrality import (  # noqa: F401
    betweenness_centrality,
    degree_centrality,
    eigenvector_centrality,
)
