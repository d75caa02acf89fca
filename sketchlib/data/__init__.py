from .pages import (  # noqa: F401
    EXTRACTION_VERSION,
    extract_text_expr,
    extract_text_py,
    generate_pages,
    wrap_html,
    write_pages_parquet,
)
from .crawldelta import crawl_delta, delta_summary  # noqa: F401
from .tables import PagesTable  # noqa: F401
from .warc import (  # noqa: F401
    build_warc,
    iter_warc_records,
    read_warc,
    warc_to_pages,
    write_warc,
)
