from .pages import (  # noqa: F401
    EXTRACTION_VERSION,
    extract_text_expr,
    extract_text_py,
    generate_pages,
    wrap_html,
    write_pages_parquet,
)
from .tables import PagesTable  # noqa: F401
