from drug_target_discovery_spark.plans.pipeline import (  # noqa: F401
    DrugTargetPipeline,
    PipelineParams,
)
