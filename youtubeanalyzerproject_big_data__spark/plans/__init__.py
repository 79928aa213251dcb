from youtubeanalyzerproject_big_data__spark.plans import inspect

__all__ = ["inspect"]
