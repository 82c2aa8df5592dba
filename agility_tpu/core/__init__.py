from agility_tpu.core import quat
from agility_tpu.core.model import RobotModel, CollisionSphere
from agility_tpu.core.urdf import load_urdf, build_go2_model
