from borges_spark.sources.synthetic_web import gen_pages, gen_seeds  # noqa: F401
