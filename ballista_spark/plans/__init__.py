from ballista_spark.plans.explain import (
    explain_text,
    plan_summary,
)

__all__ = ["explain_text", "plan_summary"]
