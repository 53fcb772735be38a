/* Fast ASCII formatter for legacy-VTK field blocks.
 *
 * The reference writes fields with C++ ostream defaults (%g, 6 significant
 * digits, e.g. laplace2D.h:333-341); formatting millions of values through
 * Python string machinery dominates VTK dump time, so this tiny native
 * runtime component does it in C.  Loaded via ctypes (no CPython API
 * dependency); built on demand by vtkfmt.py.
 */
#include <stdio.h>
#include <string.h>

/* Format n doubles as "%g " tokens, newline after every row_len values
 * (matching the reference's row-per-y layout).  Returns bytes written, or
 * -1 if out_cap would be exceeded. */
long vtk_format_f64(const double *vals, long n, long row_len, char *out,
                    long out_cap) {
    long pos = 0;
    for (long i = 0; i < n; ++i) {
        if (pos + 32 > out_cap) return -1;
        /* cast to float first: the reference streams float(value) */
        pos += sprintf(out + pos, "%g ", (double)(float)vals[i]);
        if (row_len > 0 && (i + 1) % row_len == 0) {
            out[pos++] = '\n';
        }
    }
    return pos;
}

long vtk_format_f32(const float *vals, long n, long row_len, char *out,
                    long out_cap) {
    long pos = 0;
    for (long i = 0; i < n; ++i) {
        if (pos + 32 > out_cap) return -1;
        pos += sprintf(out + pos, "%g ", (double)vals[i]);
        if (row_len > 0 && (i + 1) % row_len == 0) {
            out[pos++] = '\n';
        }
    }
    return pos;
}

/* Vector block: one "vx vy vz\n" line per point. */
long vtk_format_vec3_f64(const double *vx, const double *vy, const double *vz,
                         long n, char *out, long out_cap) {
    long pos = 0;
    for (long i = 0; i < n; ++i) {
        if (pos + 96 > out_cap) return -1;
        pos += sprintf(out + pos, "%g %g %g\n", (double)(float)vx[i],
                       (double)(float)vy[i], (double)(float)vz[i]);
    }
    return pos;
}
