import sys

from datacontract_cli_spark.cli import main

sys.exit(main())
