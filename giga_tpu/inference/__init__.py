from giga_tpu.inference.planner import GIGAPlanner, VGNPlanner, State

__all__ = ["GIGAPlanner", "VGNPlanner", "State"]
