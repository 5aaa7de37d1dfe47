from .fps import fps_pallas

__all__ = ["fps_pallas"]
