"""Logging facade.

reference: syslogwrapper/syslog_wrapper.go:14-50 + the interface in
syslogwrapper/syslogwrapper_interface.go:5-11 (Warning/Error/Info/Debug
injected into every plugin via the registry, api_plugins/registry.go:51-55).

The engine's twin is the stdlib ``logging`` module behind one factory:
driver-side components log through ``get_logger``; executor-side code
runs under Spark's log4j and should not hold Python logger state.
"""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(asctime)s %(levelname)s %(name)s: %(message)s"


def get_logger(name: str, level: int = logging.INFO) -> logging.Logger:
    """Namespaced logger (idempotent handler setup)."""
    logger = logging.getLogger(f"mysql_public_data_ingestor_spark.{name}")
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.propagate = False
    logger.setLevel(level)
    return logger
