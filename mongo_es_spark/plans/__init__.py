"""Task -> DataFrame logical-plan builders (the declarative heart of
the rebuild: a Task is compiled to a plan, Catalyst picks the physical
strategy)."""

from .scan import scan_ir_frame, scan_mapped_frame

__all__ = ["scan_ir_frame", "scan_mapped_frame"]
