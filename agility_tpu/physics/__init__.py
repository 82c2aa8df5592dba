from agility_tpu.physics.constants import ModelConsts
from agility_tpu.physics.state import SimState
