"""The CDC consumption surface: wire framing, schema registry, protocol
client, mock server, and the Structured Streaming data source speaking
the MariaDB MaxScale 6 CDC protocol (the reference's entire purpose).
"""

from .framing import Frame, JsonFrameScanner  # noqa: F401
from .schema_registry import SchemaRegistry, ddl_to_struct  # noqa: F401
