from veri_spark.plans.registry import ORACLES, QUERIES

__all__ = ["ORACLES", "QUERIES"]
