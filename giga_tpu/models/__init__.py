from giga_tpu.models.registry import get_network, load_network

__all__ = ["get_network", "load_network"]
