from . import reconcile, sales_facts

__all__ = ["reconcile", "sales_facts"]
