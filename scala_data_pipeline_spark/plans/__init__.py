from .inspect import explain_str, plan_audit

__all__ = ["explain_str", "plan_audit"]
