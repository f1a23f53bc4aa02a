"""Descriptor-suite models: fused multi-descriptor device programs."""

from topo_descriptors_tpu.models.suite import SuiteConfig, TerrainSuite

__all__ = ["SuiteConfig", "TerrainSuite"]
