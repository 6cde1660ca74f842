from metrics_advisor_spark.plans.analyze import Analysis, analyze

__all__ = ["Analysis", "analyze"]
