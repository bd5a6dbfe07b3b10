from drug_target_discovery_spark.functions.stats import (  # noqa: F401
    bh_fdr,
    minmax_scale,
    student_t_two_sided_p,
    welch_t_stats,
    zscore,
)
