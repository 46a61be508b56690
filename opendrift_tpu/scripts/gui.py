"""Graphical launcher for drift simulations (Tkinter).

Counterpart of the reference's Tkinter GUI (reference:
opendrift/scripts/opendrift_gui.py:1-977): model picker, seeding form,
config entries generated from the model's config schema, forcing-file
list, run button with live log, and post-run plot/animation.  The
simulation logic lives in :class:`GuiController` (testable headless);
:class:`OpenDriftGUI` is the thin Tk view.
"""

import logging
import sys
from datetime import datetime, timedelta

logger = logging.getLogger(__name__)

GUI_MODELS = ["OceanDrift", "OpenOil", "Leeway", "ShipDrift", "OpenBerg",
              "PlastDrift", "RadionuclideDrift", "ChemicalDrift",
              "SedimentDrift", "PelagicEggDrift"]


class GuiController:
    """Headless application logic behind the GUI."""

    def __init__(self):
        self.model_name = GUI_MODELS[0]
        self.simulation = None
        self.reader_paths = []

    # ------------------------------------------------------------- model
    def available_models(self):
        import opendrift_tpu
        names = opendrift_tpu.get_model_names()
        return [m for m in GUI_MODELS if m in names]

    def select_model(self, name):
        import opendrift_tpu
        self.model_name = name
        self.simulation = opendrift_tpu.get_model(name)(
            loglevel=logging.INFO)
        return self.simulation

    def seed_config_items(self):
        """(key, spec) config entries relevant for seeding forms
        (reference opendrift_gui.py builds forms from config levels)."""
        if self.simulation is None:
            self.select_model(self.model_name)
        out = []
        for key in self.simulation._config:
            if key.startswith("seed:"):
                out.append((key, self.simulation._config[key]))
        return out

    def add_forcing(self, path):
        from ..fields.factory import reader_from_url
        reader = reader_from_url(path)
        self.simulation.add_reader(reader)
        self.reader_paths.append(path)
        return reader

    # --------------------------------------------------------------- run
    def run(self, lon, lat, radius=0.0, number=1000, start_time=None,
            duration_hours=12.0, time_step=900, outfile=None,
            seed_kwargs=None, log=print):
        """Seed + run; returns the simulation object."""
        if self.simulation is None:
            self.select_model(self.model_name)
        o = self.simulation
        start_time = start_time or datetime.utcnow()
        log(f"Seeding {number} {self.model_name} elements at "
            f"({lon:.3f}, {lat:.3f})")
        for reader in getattr(o.env, "readers", {}).values():
            try:
                import numpy as _np
                if not _np.any(reader.covers_positions(
                        _np.atleast_1d(lon), _np.atleast_1d(lat))):
                    log(f"WARNING: seed position is outside reader "
                        f"'{reader.name}' — elements may not move")
            except Exception:
                pass
        o.seed_elements(lon=float(lon), lat=float(lat),
                        radius=float(radius), number=int(number),
                        time=start_time, **(seed_kwargs or {}))
        log(f"Running {duration_hours} h, dt={time_step} s")
        o.run(duration=timedelta(hours=float(duration_hours)),
              time_step=int(time_step), outfile=outfile)
        log("Simulation finished.")
        return o


class OpenDriftGUI:
    """Tk view (requires a display)."""

    def __init__(self):
        import tkinter as tk
        from tkinter import ttk, filedialog, scrolledtext
        self.tk = tk
        self.ttk = ttk
        self.filedialog = filedialog
        self.ctl = GuiController()

        self.root = tk.Tk()
        self.root.title("opendrift_tpu")
        row = 0

        tk.Label(self.root, text="Model:").grid(row=row, column=0,
                                                sticky="w")
        self.model_var = tk.StringVar(value=self.ctl.model_name)
        names = self.ctl.available_models()
        ttk.Combobox(self.root, textvariable=self.model_var,
                     values=names, state="readonly"
                     ).grid(row=row, column=1, sticky="we")
        row += 1

        self.entries = {}
        for label, default in [("Longitude", "4.5"), ("Latitude", "60.0"),
                               ("Radius [m]", "1000"),
                               ("Number", "1000"),
                               ("Start (YYYY-mm-dd HH:MM)",
                                datetime.utcnow().strftime(
                                    "%Y-%m-%d %H:%M")),
                               ("Duration [h]", "12"),
                               ("Time step [s]", "900")]:
            tk.Label(self.root, text=label).grid(row=row, column=0,
                                                 sticky="w")
            e = tk.Entry(self.root)
            e.insert(0, default)
            e.grid(row=row, column=1, sticky="we")
            self.entries[label] = e
            row += 1

        tk.Button(self.root, text="Add forcing file...",
                  command=self._add_forcing).grid(row=row, column=0)
        tk.Button(self.root, text="Run", command=self._run
                  ).grid(row=row, column=1)
        row += 1
        tk.Button(self.root, text="Plot", command=self._plot
                  ).grid(row=row, column=0)
        tk.Button(self.root, text="Animate", command=self._animate
                  ).grid(row=row, column=1)
        row += 1

        self.log_box = scrolledtext.ScrolledText(self.root, height=14,
                                                 width=72)
        self.log_box.grid(row=row, column=0, columnspan=2)

    def _log(self, msg):
        self.log_box.insert(self.tk.END, str(msg) + "\n")
        self.log_box.see(self.tk.END)
        self.root.update_idletasks()

    def _add_forcing(self):
        path = self.filedialog.askopenfilename()
        if path:
            self.ctl.select_model(self.model_var.get())
            r = self.ctl.add_forcing(path)
            self._log(f"Added reader: {r.name}")

    def _run(self):
        e = self.entries
        try:
            self.ctl.model_name = self.model_var.get()
            start = datetime.strptime(
                e["Start (YYYY-mm-dd HH:MM)"].get(), "%Y-%m-%d %H:%M")
            self.ctl.run(
                lon=float(e["Longitude"].get()),
                lat=float(e["Latitude"].get()),
                radius=float(e["Radius [m]"].get()),
                number=int(e["Number"].get()),
                start_time=start,
                duration_hours=float(e["Duration [h]"].get()),
                time_step=int(e["Time step [s]"].get()),
                log=self._log)
        except Exception as exc:  # surface errors in the log box
            self._log(f"ERROR: {exc}")

    def _plot(self):
        if self.ctl.simulation is not None:
            self.ctl.simulation.plot()

    def _animate(self):
        if self.ctl.simulation is not None:
            self.ctl.simulation.animation()

    def mainloop(self):
        self.root.mainloop()


def main():
    try:
        gui = OpenDriftGUI()
    except Exception as e:
        print(f"Cannot start GUI ({e}); a display is required.",
              file=sys.stderr)
        sys.exit(1)
    gui.mainloop()


if __name__ == "__main__":
    main()
