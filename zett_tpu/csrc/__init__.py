"""Native (C++) host library. Import is best-effort: if the toolchain is
unavailable the Python reference implementations are used instead."""

try:
    from . import host_lib
except Exception:  # pragma: no cover - graceful fallback
    host_lib = None

__all__ = ["host_lib"]
