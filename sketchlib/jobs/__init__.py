"""spark-submit entry points for the north-star queries over a
Common-Crawl-style pages table (run via
``spark-submit --py-files sketchlib.zip -m`` or ``python -m sketchlib.jobs.pages_job``)."""
