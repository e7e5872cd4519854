"""spark-submit entrypoint: imports the library from the --py-files zip
(NOT from the repo checkout — this file is the only local path shipped)
and delegates to the validation CLI."""

import sys

from ocsf_validator_spark.runner import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
