"""Cross-cutting utilities: timing/observability."""

from topo_descriptors_tpu.utils.timing import timer, Timings

__all__ = ["timer", "Timings"]
