# Environment for the librispeech recipe (reference: egs/librispeech/path.sh).
# No Kaldi needed: feature extraction, subword training, and scoring are all
# in-framework.
export E2EASR=$(cd $(dirname ${BASH_SOURCE[0]})/../..; pwd)
export PYTHONPATH=$E2EASR:$PYTHONPATH
export PATH=$E2EASR/utils:$PATH
