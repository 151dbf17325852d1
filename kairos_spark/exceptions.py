"""Exception types (parity: /root/reference/kairos/exceptions.py:1-11)."""


class KairosSparkException(Exception):
    """Base exception for the engine."""


class UnknownInterval(KairosSparkException):
    """Raised when a query names an interval absent from the config."""
