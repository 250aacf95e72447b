from tpugnn.utils import f2

__all__ = ["f2"]
