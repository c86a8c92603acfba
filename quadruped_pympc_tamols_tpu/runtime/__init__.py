from .control_bus import ControlBus, pack_control_block, unpack_control_block
from .controller_node import ControllerNode
from .ros2_node import (
    BaseState,
    BlindState,
    ControlSignal,
    QuadrupedPyMPCRosNode,
    RobotStateAssembler,
    TimeDebug,
    TrajectoryGenerator,
    pack_control_signal,
    pack_trajectory_generator,
    rclpy_available,
)

__all__ = [
    "ControlBus",
    "pack_control_block",
    "unpack_control_block",
    "ControllerNode",
    "BaseState",
    "BlindState",
    "ControlSignal",
    "QuadrupedPyMPCRosNode",
    "RobotStateAssembler",
    "TimeDebug",
    "TrajectoryGenerator",
    "pack_control_signal",
    "pack_trajectory_generator",
    "rclpy_available",
]
