from fuzzymatch_spark.plans.pipeline import DedupPipeline

__all__ = ["DedupPipeline"]
