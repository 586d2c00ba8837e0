#!/bin/bash
# Reorganize the ICLR'18 VarMisuse dataset download into the fold layout
# this framework consumes, splitting out the unseen-project "testonly" fold
# ({commandline, humanizer, lean}) and re-sharding files for streaming.
# Capability-parity with the reference's reorg_varmisuse_data.sh (·:1-40).

# Set this to the path of the downloaded dataset:
DOWNLOADED_ZIP="graph-dataset.zip"
# Set this to the path where the data will be extracted to (requires ~15 GB):
OUTDIR="reorged-varmisuse-dataset"

### The following bits should not require any changes:
CODEDIR=$(dirname "$0")
TESTONLY_PROJS="commandline humanizer lean"

for fold in train valid test testonly; do
    mkdir -p "${OUTDIR}/graphs-${fold}-raw"
done

if command -v 7za >/dev/null 2>&1; then
    7za x "${DOWNLOADED_ZIP}"
else
    unzip "${DOWNLOADED_ZIP}"
fi

for test_proj in $TESTONLY_PROJS; do
    mv graph-dataset/${test_proj}/graphs-test/* "${OUTDIR}/graphs-testonly-raw"
    rm -rf graph-dataset/${test_proj}
done

for fold in train valid test; do
    mv graph-dataset/*/graphs-${fold}/* "${OUTDIR}/graphs-${fold}-raw"
done

for file in "${OUTDIR}"/*/*.gz; do
    new_file=$(echo "${file}" | sed -e 's/.gz$/.json.gz/')
    mv "${file}" "${new_file}"
done

for fold in train valid test testonly; do
    python3 -m tf_gnn_samples_tpu.utils.varmisuse_data_splitter \
        "${OUTDIR}/graphs-${fold}-raw/" "${OUTDIR}/graphs-${fold}/"
    rm -rf "${OUTDIR}/graphs-${fold}-raw/"
done
