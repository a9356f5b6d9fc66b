from . import costs, unicycle

__all__ = ["costs", "unicycle"]
