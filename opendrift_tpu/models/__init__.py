from .base import OpenDriftSimulation, Mode, StepContext
from .oceandrift import OceanDrift, Lagrangian3DArray
from .windblow import WindBlow
from .seaicedrift import SeaIceDrift
from .pelagicegg import PelagicEggDrift
from .plastdrift import PlastDrift
from .sedimentdrift import SedimentDrift
from .leeway import Leeway
from .shipdrift import ShipDrift
from .openoil import OpenOil
from .openberg import OpenBerg
from .larvalfish import LarvalFish, LarvalFishExtended
from .sealice import SeaLice
from .radionuclides import RadionuclideDrift
from .chemicaldrift import ChemicalDrift
from .legacy import OpenHNS, OpenBergOld
from .model_template import ModelTemplate

__all__ = ["OpenDriftSimulation", "Mode", "StepContext", "OceanDrift",
           "Lagrangian3DArray", "WindBlow", "SeaIceDrift",
           "PelagicEggDrift", "PlastDrift", "SedimentDrift", "Leeway",
           "ShipDrift", "OpenOil", "OpenBerg", "LarvalFish", "LarvalFishExtended", "SeaLice",
           "RadionuclideDrift", "ChemicalDrift", "OpenHNS",
           "OpenBergOld", "ModelTemplate"]
