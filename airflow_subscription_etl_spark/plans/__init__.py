from .pipeline import run_intent

__all__ = ["run_intent"]
