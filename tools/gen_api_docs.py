"""Generate docs/api.md: public API reference from docstrings."""
import importlib
import inspect
import io
import sys

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")

MODULES = [
    ("gpsat_tpu", "Package root (enable_x64, enable_compilation_cache, paths)"),
    ("gpsat_tpu.experts", "LocalExpertOI orchestrator"),
    ("gpsat_tpu.distributed", "Multi-host execution (jax.distributed)"),
    ("gpsat_tpu.models", "Model registry"),
    ("gpsat_tpu.models.means", "Trainable prior mean functions"),
    ("gpsat_tpu.models.gpr", "Exact GPR"),
    ("gpsat_tpu.models.sgpr", "Sparse GPR (Titsias)"),
    ("gpsat_tpu.models.svgp", "SVGP"),
    ("gpsat_tpu.models.vff", "Variational Fourier Features"),
    ("gpsat_tpu.models.asvgp", "Actually-Sparse VGP"),
    ("gpsat_tpu.models.sklearn_model", "sklearn wrapper"),
    ("gpsat_tpu.models.torch_gpr", "Torch GPR / KISS-GP"),
    ("gpsat_tpu.parallel.batching", "Tile buckets"),
    ("gpsat_tpu.parallel.engine", "Batched execution engine"),
    ("gpsat_tpu.optim.lbfgs", "Batched L-BFGS"),
    ("gpsat_tpu.ops.kernels", "Gram construction"),
    ("gpsat_tpu.ops.linalg", "Masked linear algebra"),
    ("gpsat_tpu.ops.transforms", "Bijectors"),
    ("gpsat_tpu.data.dataloader", "Unified loading"),
    ("gpsat_tpu.data.netcdf", "netCDF4 via h5py"),
    ("gpsat_tpu.data.zarr_reader", "zarr v2 reader/writer (stdlib)"),
    ("gpsat_tpu.data.pytables_compat", "Reference-store (PyTables) read interop"),
    ("gpsat_tpu.data.select", "Selection DSL"),
    ("gpsat_tpu.data.store", "HDF5 table store"),
    ("gpsat_tpu.data.binning", "Binning"),
    ("gpsat_tpu.data.ingest", "Raw-file ingest"),
    ("gpsat_tpu.data.prediction_locations", "Prediction locations"),
    ("gpsat_tpu.data.expert_locations", "Expert-location generation"),
    ("gpsat_tpu.postprocess", "Smoothing + gluing"),
    ("gpsat_tpu.config", "Config dataclasses"),
    ("gpsat_tpu.xval", "Cross-validation"),
    ("gpsat_tpu.plot_utils", "Plotting"),
    ("gpsat_tpu.utils", "Utilities"),
    ("gpsat_tpu.utils.flops", "FLOP accounting (roofline)"),
    ("gpsat_tpu.prime_cache", "Compile-cache priming"),
    ("gpsat_tpu.synthetic", "Synthetic data"),
    ("gpsat_tpu.datetime_utils", "Satellite datetimes"),
]

out = io.StringIO()
out.write("# API reference\n\n")
out.write("Generated from docstrings (`python tools/gen_api_docs.py`). One-line\n"
          "summaries only — see the module docstrings for design notes and the\n"
          "reference-file citations (`GPSat/<file>:<lines>`) used by the parity\n"
          "audit.\n")

for mod_name, title in MODULES:
    try:
        mod = importlib.import_module(mod_name)
    except Exception as e:
        print(f"skip {mod_name}: {e}")
        continue
    out.write(f"\n## `{mod_name}` — {title}\n\n")
    doc = inspect.getdoc(mod)
    if doc:
        out.write(doc.split("\n\n")[0].replace("\n", " ") + "\n\n")
    rows = []
    for name in sorted(dir(mod)):
        if name.startswith("_"):
            continue
        obj = getattr(mod, name)
        if not (inspect.isfunction(obj) or inspect.isclass(obj)):
            continue
        if getattr(obj, "__module__", None) != mod_name:
            continue
        d = inspect.getdoc(obj)
        first = (d.split("\n")[0] if d else "").replace("|", "\\|")
        kind = "class" if inspect.isclass(obj) else "fn"
        try:
            sig = str(inspect.signature(obj))
            if len(sig) > 60:
                sig = sig[:57] + "..."
        except (ValueError, TypeError):
            sig = ""
        rows.append(f"| `{name}{sig if kind == 'fn' else ''}` | {kind} | {first} |")
    if rows:
        out.write("| symbol | kind | summary |\n|---|---|---|\n")
        out.write("\n".join(rows) + "\n")

open("/root/repo/docs/api.md", "w").write(out.getvalue())
print("wrote docs/api.md,", len(out.getvalue()), "chars")
