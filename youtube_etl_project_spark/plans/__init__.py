"""Named queries implementing SURVEY.md §2's operator inventory on the
driver fixture tables. Each module registers into
``youtube_etl_project_spark.registry.REGISTRY`` at import."""
