"""spark-submit launcher for the extraction pipeline.

Lives OUTSIDE the hickoryspark package on purpose: spark-submit puts
the entry script's directory on sys.path, so submitting a file from
inside the package would shadow the package's own module resolution
(the --py-files zip is the real code source on the executors).

    zip -r /tmp/hickoryspark.zip hickoryspark
    spark-submit --master <cluster> --py-files /tmp/hickoryspark.zip \
        tools/submit_extract.py --input /data/pages --output /data/extracted
"""

import sys

from hickoryspark.cli import main

if __name__ == "__main__":
    sys.exit(main())
