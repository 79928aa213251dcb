from youtubeanalyzerproject_big_data__spark.sources import xml_ingest

__all__ = ["xml_ingest"]
