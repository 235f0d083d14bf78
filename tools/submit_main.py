"""Thin spark-submit launcher: `spark-submit --py-files pkg.zip
tools/submit_main.py <run.py args>`. run.py uses package-relative imports,
so the submitted script must import the package (from the --py-files zip
or PYTHONPATH) rather than be the module file itself."""
import sys

from opentelemetry_collector_contrib_spark.run import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
