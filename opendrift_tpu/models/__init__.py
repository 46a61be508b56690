from .base import OpenDriftSimulation, Mode, StepContext
from .oceandrift import OceanDrift, Lagrangian3DArray
from .windblow import WindBlow
from .seaicedrift import SeaIceDrift

__all__ = ["OpenDriftSimulation", "Mode", "StepContext", "OceanDrift",
           "Lagrangian3DArray", "WindBlow", "SeaIceDrift"]
