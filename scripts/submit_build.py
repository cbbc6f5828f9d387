#!/usr/bin/env python
"""Package ckg_spark and launch the build through ``spark-submit
--py-files`` — the cluster deployment path of the north rule, exercised
end-to-end in the sandbox against ``local[N]``.

    python scripts/submit_build.py --pages <parquet> --warehouse <dir> [--master local[8]]
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(dest_dir: str) -> str:
    """Zip the ckg_spark package (plus its YAML catalog data file)."""
    zip_path = os.path.join(dest_dir, "ckg_spark.zip")
    pkg = os.path.join(REPO, "ckg_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for name in files:
                if name.endswith((".py", ".yml")):
                    full = os.path.join(dirpath, name)
                    z.write(full, os.path.relpath(full, REPO))
    return zip_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--master", default=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
    ap.add_argument("--terms-per-type", type=int, default=60)
    ap.add_argument("--export-dir", default=None)
    args = ap.parse_args()

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    workdir = tempfile.mkdtemp(prefix="ckg_submit_")
    zip_path = build_zip(workdir)
    cmd = [
        spark_submit,
        "--master", args.master,
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "build_job.py"),
        "--pages", args.pages,
        "--warehouse", args.warehouse,
        "--terms-per-type", str(args.terms_per_type),
    ]
    if args.export_dir:
        cmd += ["--export-dir", args.export_dir]
    raise SystemExit(subprocess.run(cmd).returncode)


if __name__ == "__main__":
    main()
