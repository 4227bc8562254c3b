"""First-class operators beyond the scalar-function tier: deduplication,
similarity search, multimodal column processing.

Each operator is a function DataFrame -> DataFrame composed from built-in
pyspark.sql.functions wherever semantics allow (JVM-side, codegen-friendly);
Arrow-batched pandas UDFs are the explicit fallback tier, never row-at-a-time
Python.
"""

from . import components  # noqa: F401
from . import dedup  # noqa: F401
from . import multimodal  # noqa: F401
from . import packing  # noqa: F401
from . import similarity  # noqa: F401
from . import skew  # noqa: F401
from . import zorder  # noqa: F401
