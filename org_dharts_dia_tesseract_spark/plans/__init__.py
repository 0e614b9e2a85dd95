from .inspect import (explain_str, has_broadcast_hash_join, has_exchange,
                      n_exchanges, pushed_filters, scan_read_schema)

__all__ = ["explain_str", "pushed_filters", "scan_read_schema",
           "has_broadcast_hash_join", "has_exchange", "n_exchanges"]
