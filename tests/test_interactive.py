"""Key->command transition table of the interactive play panel.

Mirrors the reference viewer's keyboard semantics
(bbc/legged_gym/envs/base/base_task.py:71-113): epsilon velocity nudges,
behavior-mode keys 1-5, height keys clamped to command ranges.
"""
from agility_tpu.cli.interactive import MODES, apply_key

JH = (0.4, 0.7)
LH = (0.2, 0.4)
CMD0 = dict(vx=0.0, vy=0.0, wz=0.0, jump_h=0.55, loco_h=0.30)


def _press(keys, cmd=None, mode=2):
    cmd = dict(CMD0 if cmd is None else cmd)
    action = None
    for k in keys:
        cmd, mode, action = apply_key(ord(k), cmd, mode, JH, LH)
    return cmd, mode, action


def test_velocity_nudges_are_eps_sized():
    cmd, _, _ = _press("wwwsaadqe")
    assert abs(cmd["vx"] - 0.2) < 1e-9    # +3 -1 nudges of 0.1
    assert abs(cmd["vy"] - 0.1) < 1e-9    # a a d = +2 -1
    assert abs(cmd["wz"]) < 1e-9          # q e cancel


def test_space_zeroes_velocities_only():
    cmd, _, _ = _press("wwaq j ")
    assert cmd["vx"] == cmd["vy"] == cmd["wz"] == 0.0
    assert cmd["jump_h"] > CMD0["jump_h"]  # heights survive


def test_mode_keys_select_all_modes():
    for i in range(len(MODES)):
        _, mode, _ = _press(str(i + 1))
        assert mode == i
    # out-of-range digit is ignored
    _, mode, _ = _press(str(len(MODES) + 1), mode=1)
    assert mode == 1


def test_height_keys_clamp_to_ranges():
    cmd, _, _ = _press("j" * 20 + "h" * 20)
    assert cmd["jump_h"] == JH[1] and cmd["loco_h"] == LH[1]
    cmd, _, _ = _press("u" * 20 + "n" * 20)
    assert cmd["jump_h"] == JH[0] and cmd["loco_h"] == LH[0]


def test_quit_reset_and_nokey():
    _, _, action = _press("x")
    assert action == "quit"
    cmd, mode, action = _press("r")
    assert action == "reset" and cmd == CMD0 and mode == 2
    cmd, mode, action = apply_key(-1, CMD0, 0, JH, LH)  # nodelay idle
    assert action is None and cmd == CMD0 and mode == 0
    _, _, action = apply_key(27, CMD0, 0, JH, LH)  # ESC
    assert action == "quit"
