// Native host-side data kernels for the HEM/DGM input pipelines.
//
// The reference recomputes per-sample homography flows and mean/std
// grayscale conversions in numpy per epoch (HEM/dataset/data_loader.py,
// DGM UnHomoTrainData) - at TPU step times the Python loader starves the
// chip (measured 51 ms/sample vs 2-10 ms steps).  These kernels keep the
// exact numpy float64 semantics (see dmhomo_tpu/geometry/host.py) at ~10x
// less wall time per call.
//
// Build: cc -O3 -shared -fPIC hemdata.cpp -o libhemdata.so
// Bound via ctypes (dmhomo_tpu/native/__init__.py); pure-numpy fallback
// stays authoritative for parity tests.

#include <cstdint>
#include <cmath>

extern "C" {

// flow(x, y) = H(x, y) - (x, y), float64 math, +eps divide guard,
// fp32 output in (h, w, 2) with (u, v) channel order.
// Parity: geometry/host.py::homography_to_flow_np.
void homography_flow_f32(const double* H, int h, int w, double eps,
                         float* out) {
    const double h00 = H[0], h01 = H[1], h02 = H[2];
    const double h10 = H[3], h11 = H[4], h12 = H[5];
    const double h20 = H[6], h21 = H[7], h22 = H[8];
    for (int y = 0; y < h; ++y) {
        const double fy = (double)y;
        float* row = out + (size_t)y * w * 2;
        for (int x = 0; x < w; ++x) {
            const double fx = (double)x;
            const double u = h00 * fx + h01 * fy + h02;
            const double v = h10 * fx + h11 * fy + h12;
            const double z = h20 * fx + h21 * fy + h22 + eps;
            row[2 * x + 0] = (float)(u / z - fx);
            row[2 * x + 1] = (float)(v / z - fy);
        }
    }
}

// mapping(x, y) = H(x, y), same conventions; out (h, w, 2) fp32.
void homography_mapping_f32(const double* H, int h, int w, double eps,
                            float* out) {
    const double h00 = H[0], h01 = H[1], h02 = H[2];
    const double h10 = H[3], h11 = H[4], h12 = H[5];
    const double h20 = H[6], h21 = H[7], h22 = H[8];
    for (int y = 0; y < h; ++y) {
        const double fy = (double)y;
        float* row = out + (size_t)y * w * 2;
        for (int x = 0; x < w; ++x) {
            const double fx = (double)x;
            const double u = h00 * fx + h01 * fy + h02;
            const double v = h10 * fx + h11 * fy + h12;
            const double z = h20 * fx + h21 * fy + h22 + eps;
            row[2 * x + 0] = (float)(u / z);
            row[2 * x + 1] = (float)(v / z);
        }
    }
}

// gray = mean_c((img - mean_c') / std_c'), float64 accumulation, fp32 out.
// img: (h, w, 3) uint8; mean/std: (3,). Parity: hem_data.normalize_gray.
void normalize_gray_u8(const uint8_t* img, int h, int w, const double* mean,
                       const double* std, float* out) {
    const double m0 = mean[0], m1 = mean[1], m2 = mean[2];
    const double i0 = 1.0 / std[0], i1 = 1.0 / std[1], i2 = 1.0 / std[2];
    const size_t n = (size_t)h * w;
    for (size_t p = 0; p < n; ++p) {
        const uint8_t* px = img + 3 * p;
        const double a = ((double)px[0] - m0) * i0;
        const double b = ((double)px[1] - m1) * i1;
        const double c = ((double)px[2] - m2) * i2;
        out[p] = (float)((a + b + c) / 3.0);
    }
}

// float32-image variant (synthetic pairs path).
void normalize_gray_f32(const float* img, int h, int w, const double* mean,
                        const double* std, float* out) {
    const double m0 = mean[0], m1 = mean[1], m2 = mean[2];
    const double i0 = 1.0 / std[0], i1 = 1.0 / std[1], i2 = 1.0 / std[2];
    const size_t n = (size_t)h * w;
    for (size_t p = 0; p < n; ++p) {
        const float* px = img + 3 * p;
        const double a = ((double)px[0] - m0) * i0;
        const double b = ((double)px[1] - m1) * i1;
        const double c = ((double)px[2] - m2) * i2;
        out[p] = (float)((a + b + c) / 3.0);
    }
}

}  // extern "C"
