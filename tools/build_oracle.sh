#!/bin/bash
# Build the reference GPc binaries (gp/gplvm/ivm) as a test oracle, without
# gfortran: uses the reference's own f2c translation (ndlfortran.c) plus the
# minimal shim below.  Output goes to $ORACLE_DIR (default /tmp/refbuild).
# The oracle is only used by tests/test_oracle.py to compare learned models;
# no reference source enters the gpc_tpu tree.
set -e
REF=${REF:-/root/reference}
ORACLE_DIR=${ORACLE_DIR:-/tmp/refbuild}
L=/usr/lib/x86_64-linux-gnu
mkdir -p "$ORACLE_DIR" && cd "$ORACLE_DIR"

cat > f2c.h <<'HDR'
/* minimal f2c compatibility header: integer matches the C++ `const int&` ABI */
#ifndef F2C_INCLUDE
#define F2C_INCLUDE
typedef int integer;
typedef unsigned int uinteger;
typedef float real;
typedef double doublereal;
typedef int logical;
#define TRUE_ (1)
#define FALSE_ (0)
#define abs(x) ((x) >= 0 ? (x) : -(x))
#define dabs(x) (doublereal)abs(x)
#define min(a,b) ((a) <= (b) ? (a) : (b))
#define max(a,b) ((a) >= (b) ? (a) : (b))
#define dmin(a,b) (doublereal)min(a,b)
#define dmax(a,b) (doublereal)max(a,b)
#ifdef __cplusplus
extern "C" {
#endif
doublereal d_int(doublereal *x);
#ifdef __cplusplus
}
#endif
#endif
HDR

cat > f2c_shim.c <<'SHIM'
#include <math.h>
#include <stdio.h>
double d_int(double *x) { return (*x > 0) ? floor(*x) : -floor(-*x); }
/* lbfgs_ is absent from the reference's f2c bundle; only -O quasinew needs it */
void lbfgs_(const int *n, const int *m, double *x, const double *f, double *g,
            const int *diagco, double *diag, const int *iprint, const double *eps,
            const double *xtol, double *w, int *iflag) {
  fprintf(stderr, "lbfgs_ stub: not available in oracle build\n");
  *iflag = -1;
}
SHIM

gcc -O2 -c f2c_shim.c -o f2c_shim.o
gcc -O2 -I. -c "$REF/ndlfortran.c" -o ndlfortran.o
OBJS="ndlfortran.o f2c_shim.o"
for f in ndlutil ndlstrutil ndlassert CMatrix CTransform CDist CKern CNoise \
         COptimisable CMltools CGp CGplvm CIvm CClctrl; do
  g++ -O2 -std=c++03 -I. -I"$REF" -c "$REF/$f.cpp" -o "$f.o"
  OBJS="$OBJS $f.o"
done
for tool in gp gplvm ivm; do
  g++ -O2 -std=c++03 -I. -I"$REF" -c "$REF/$tool.cpp" -o "${tool}_main.o"
  g++ -o "$tool" "${tool}_main.o" $OBJS "$L/liblapack.so.3" "$L/libblas.so.3" -lm
done
cp -r "$REF/examples" . 2>/dev/null || true
echo "oracle binaries built in $ORACLE_DIR"
