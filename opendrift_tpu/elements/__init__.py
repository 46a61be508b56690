from .elements import LagrangianArray, ElementState, PassiveTracer

__all__ = ["LagrangianArray", "ElementState", "PassiveTracer"]
