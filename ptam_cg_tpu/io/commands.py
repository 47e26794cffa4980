"""Runtime command console: the headless analog of the reference's GUI
command registry + live GVars tweaks (ref: GUI.ParseLine lines in
config/settings.cfg, command registration src/main.cc:21-23 and
src/GLWindow2.cc:15-323; doc/PTAM.txt:205-217 documents the console).

The reference registers verbs (``Reset``, ``PokeTracker``, ``SaveMap``,
``KeyPress``) and lets any GVars tunable be reassigned mid-run from the
console. Here the same surface is a small parser over an engine handle:

- verbs map to engine/mapmaker methods
- ``Section.Name=value`` assignments hit a WHITELIST of tunables that
  are genuinely host-read at runtime. Everything else in this framework
  is baked into compiled XLA programs at construction (the price of
  one-dispatch-per-frame tracking), so unknown/compiled tunables are
  rejected with a clear message instead of silently doing nothing —
  unlike GVars, which would happily set a variable nothing reads.
- a command file drives a run like the reference's settings.cfg
  GUI.ParseLine block; lines may be prefixed ``@N`` to fire at frame N.

Draw/GUI toggles (``DrawMap``, ``DrawAR``) have no headless analog and
are documented as unsupported.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np


class CommandError(ValueError):
    pass


#: name -> (getter, setter, doc). Setters validate + apply to live
#: host-read state.
def _tunables(eng) -> Dict[str, Tuple[Callable, Callable, str]]:
    mm = eng.mapmaker
    return {
        "Engine.DecisionInterval": (
            lambda: eng.decision_interval,
            lambda v: setattr(eng, "decision_interval", max(1, int(v))),
            "frames between deferred decision reads"),
        "Tracker.MinFramesBetweenKFs": (
            lambda: eng.cfg.tracker.min_frames_between_kfs,
            lambda v: setattr(
                eng, "cfg", eng.cfg.replace(
                    tracker=_dc_replace(eng.cfg.tracker,
                                        min_frames_between_kfs=int(v)))),
            "keyframe cadence floor (ref: Tracker.cc:152)"),
        "MapMaker.MaxQueueSize": (
            lambda: eng.cfg.mapmaker.max_queue_size,
            lambda v: setattr(
                eng, "cfg", eng.cfg.replace(
                    mapmaker=_dc_replace(eng.cfg.mapmaker,
                                         max_queue_size=int(v)))),
            "pending-keyframe queue bound"),
        "Bundle.MaxIterations": (
            lambda: mm.ba_cfg.max_iterations,
            lambda v: setattr(mm, "ba_cfg",
                              _dc_replace(mm.ba_cfg,
                                          max_iterations=int(v))),
            "LM iteration budget per BA run (host-read chunk target; "
            "ref: Bundle.cc:40)"),
        "Bundle.TierFloorMeas": (
            lambda: mm._tier_m_floor,
            lambda v: setattr(mm, "_tier_m_floor", int(v)),
            "pin the BA measurement tier (pre-warm large maps)"),
        "Bundle.TierFloorCams": (
            lambda: mm._tier_c_floor,
            lambda v: setattr(mm, "_tier_c_floor", int(v)),
            "pin the BA camera tier"),
        "Bundle.TierFloorPoints": (
            lambda: mm._tier_p_floor,
            lambda v: setattr(mm, "_tier_p_floor", int(v)),
            "pin the BA point tier"),
    }


def _dc_replace(dc, **kw):
    import dataclasses
    return dataclasses.replace(dc, **kw)


class CommandConsole:
    """Execute reference-console-style commands against a live engine."""

    def __init__(self, engine):
        self.eng = engine
        self.log: List[str] = []

    # -- the verb table (ref: registered GUI commands, src/main.cc:21-23,
    #    src/System.cc command callbacks) --------------------------------
    def execute(self, line: str) -> Optional[str]:
        """Run one command line; returns a human-readable result (also
        appended to ``self.log``), or raises CommandError."""
        line = line.split("//")[0].strip()
        if not line:
            return None
        out = self._dispatch(line)
        if out:
            self.log.append(out)
        return out

    def _dispatch(self, line: str) -> str:
        eng = self.eng
        if "=" in line and " " not in line.split("=")[0]:
            name, _, val = line.partition("=")
            name, val = name.strip(), val.strip()
            table = _tunables(eng)
            if name not in table:
                raise CommandError(
                    f"unknown or compile-baked tunable '{name}' "
                    f"(runtime-adjustable: {sorted(table)})")
            _, setter, _ = table[name]
            setter(float(val) if "." in val else int(val))
            getter = _tunables(eng)[name][0]
            return f"{name}={getter()}"

        parts = line.split()
        verb, args = parts[0], parts[1:]
        if verb == "Reset":
            # ref: Tracker::Reset via the 'r' key / Reset command.
            eng.reset()
            return "map ditched, tracker reset"
        if verb in ("PokeTracker", "SpacePressed"):
            # ref: spacebar -> Tracker::GUICommandHandler.
            eng.request_init()
            return "init requested"
        if verb == "SaveMap":
            from ptam_cg_tpu.io import checkpoint
            path = args[0] if args else "map_checkpoint.npz"
            checkpoint.save_map(path, eng.map,
                                tracker_state=eng.tracker_state)
            return f"map saved -> {path}"
        if verb == "DumpMap":
            from ptam_cg_tpu.io import checkpoint
            prefix = args[0] if args else "map_dump"
            checkpoint.export_map_text(prefix, eng.map)
            return f"map dumped -> {prefix}*"
        if verb == "ShowInfo":
            return (f"stage={eng.stage.name} kfs={eng.mapmaker.n_kfs()} "
                    f"pts={eng._n_points_host} "
                    f"quality={eng._last_quality}")
        if verb == "Get":
            table = _tunables(eng)
            if not args or args[0] not in table:
                raise CommandError(f"Get: expected one of "
                                   f"{sorted(table)}")
            return f"{args[0]}={table[args[0]][0]()}"
        if verb in ("DrawMap", "DrawAR", "GLWindow"):
            return f"{verb}: no-op (headless build; render offline " \
                   f"via viz/mapviewer.py / viz/ar.py)"
        raise CommandError(f"unknown command '{verb}'")


def load_command_script(path: str) -> List[Tuple[int, str]]:
    """Parse a command file into [(frame_idx, line)] — lines run at
    frame 0 unless prefixed ``@N`` (the scripted-run analog of the
    reference's GUI.ParseLine settings block)."""
    out: List[Tuple[int, str]] = []
    with open(path) as f:
        for raw in f:
            line = raw.split("//")[0].strip()
            if not line:
                continue
            frame = 0
            if line.startswith("@"):
                tok, _, rest = line.partition(" ")
                frame = int(tok[1:])
                line = rest.strip()
            out.append((frame, line))
    return sorted(out, key=lambda x: x[0])


class ScriptedConsole:
    """Frame-scheduled command execution for dataset/synthetic runs."""

    def __init__(self, engine, script: List[Tuple[int, str]]):
        self.console = CommandConsole(engine)
        self.script = list(script)
        self._next = 0

    def on_frame(self, frame_idx: int) -> List[str]:
        ran = []
        while (self._next < len(self.script)
               and self.script[self._next][0] <= frame_idx):
            _, line = self.script[self._next]
            self._next += 1
            res = self.console.execute(line)
            if res:
                ran.append(res)
        return ran
