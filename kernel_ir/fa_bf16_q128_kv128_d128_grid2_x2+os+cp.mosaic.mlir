module @_grid_entry {
  func.func @main(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32, %arg4: memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, %arg5: memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, %arg6: memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, %arg7: memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, %arg8: memref<128x128xf32, #tpu.memory_space<vmem>>, %arg9: memref<128x128xf32, #tpu.memory_space<vmem>>, %arg10: memref<128x128xf32, #tpu.memory_space<vmem>>) attributes {dimension_semantics = [#tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<parallel>, #tpu.dimension_semantics<arbitrary>], iteration_bounds = array<i64: 1, 4, 16, 16>, scalar_prefetch = 0 : i64, scratch_operands = 3 : i64, window_params = [{transform_indices = @transform_0, window_bounds = array<i64: 1, 1, 128, 128>}, {transform_indices = @transform_1, window_bounds = array<i64: 1, 1, 128, 128>}, {transform_indices = @transform_2, window_bounds = array<i64: 1, 1, 128, 128>}, {transform_indices = @transform_3, window_bounds = array<i64: 1, 1, 128, 128>}]} {
    %cst = arith.constant dense<0.127517432> : vector<128x128xf32>
    %cst_0 = arith.constant dense<0.000000e+00> : vector<128xf32>
    %cst_1 = arith.constant dense<0xFF800000> : vector<128xf32>
    %cst_2 = arith.constant dense<0.000000e+00> : vector<128x128xf32>
    %c0 = arith.constant 0 : index
    %c15_i32 = arith.constant 15 : i32
    %c0_i32 = arith.constant 0 : i32
    %0 = arith.cmpi eq, %arg3, %c0_i32 : i32
    %1 = arith.cmpi eq, %arg3, %c15_i32 : i32
    %2 = vector.load %arg4[%c0, %c0, %c0, %c0] : memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x128x128xbf16>
    %3 = vector.shape_cast %2 : vector<1x1x128x128xbf16> to vector<128x128xbf16>
    %4 = vector.load %arg5[%c0, %c0, %c0, %c0] : memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x128x128xbf16>
    %5 = vector.shape_cast %4 : vector<1x1x128x128xbf16> to vector<128x128xbf16>
    %6 = vector.load %arg6[%c0, %c0, %c0, %c0] : memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x128x128xbf16>
    %7 = vector.shape_cast %6 : vector<1x1x128x128xbf16> to vector<128x128xbf16>
    %8 = tpu.matmul %3, %5, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [1], [0], [0], [0, 0, 1, 0], [], []>} : vector<128x128xbf16>, vector<128x128xbf16>, vector<128x128xf32> -> vector<128x128xf32>
    scf.if %0 {
      %10 = arith.mulf %8, %cst : vector<128x128xf32>
      %11 = vector.multi_reduction <maximumf>, %10, %cst_1 [1] : vector<128x128xf32> to vector<128xf32>
      %12 = vector.shape_cast %11 : vector<128xf32> to vector<128x1xf32>
      %13 = vector.broadcast %12 : vector<128x1xf32> to vector<128x128xf32>
      %14 = vector.broadcast %12 : vector<128x1xf32> to vector<128x128xf32>
      %15 = arith.subf %10, %14 : vector<128x128xf32>
      %16 = math.exp2 %15 : vector<128x128xf32>
      %17 = arith.truncf %16 : vector<128x128xf32> to vector<128x128xbf16>
      %18 = vector.multi_reduction <add>, %16, %cst_0 [1] : vector<128x128xf32> to vector<128xf32>
      %19 = vector.shape_cast %18 : vector<128xf32> to vector<128x1xf32>
      %20 = vector.broadcast %19 : vector<128x1xf32> to vector<128x128xf32>
      %21 = tpu.matmul %17, %7, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<128x128xbf16>, vector<128x128xbf16>, vector<128x128xf32> -> vector<128x128xf32>
      tpu.vector_store %arg9[%c0, %c0], %13 {strides = array<i32>} : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>, 
      tpu.vector_store %arg10[%c0, %c0], %20 {strides = array<i32>} : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>, 
      tpu.vector_store %arg8[%c0, %c0], %21 {strides = array<i32>} : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>, 
    }
    %9 = arith.cmpi ne, %arg3, %c0_i32 : i32
    scf.if %9 {
      %10 = vector.load %arg9[%c0, %c0] : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>
      %11 = vector.load %arg10[%c0, %c0] : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>
      %12 = vector.load %arg8[%c0, %c0] : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>
      %13 = arith.mulf %8, %cst : vector<128x128xf32>
      %14 = vector.multi_reduction <maximumf>, %13, %cst_1 [1] : vector<128x128xf32> to vector<128xf32>
      %15 = vector.shape_cast %14 : vector<128xf32> to vector<128x1xf32>
      %16 = vector.broadcast %15 : vector<128x1xf32> to vector<128x128xf32>
      %17 = arith.maximumf %10, %16 : vector<128x128xf32>
      %18 = vector.extract_strided_slice %17 {offsets = [0, 0], sizes = [128, 1], strides = [1, 1]} : vector<128x128xf32> to vector<128x1xf32>
      %19 = vector.broadcast %18 : vector<128x1xf32> to vector<128x128xf32>
      %20 = arith.subf %13, %19 : vector<128x128xf32>
      %21 = math.exp2 %20 : vector<128x128xf32>
      %22 = arith.subf %10, %17 : vector<128x128xf32>
      %23 = math.exp2 %22 : vector<128x128xf32>
      %24 = arith.truncf %21 : vector<128x128xf32> to vector<128x128xbf16>
      %25 = arith.mulf %11, %23 : vector<128x128xf32>
      %26 = vector.multi_reduction <add>, %21, %cst_0 [1] : vector<128x128xf32> to vector<128xf32>
      %27 = vector.shape_cast %26 : vector<128xf32> to vector<128x1xf32>
      %28 = vector.broadcast %27 : vector<128x1xf32> to vector<128x128xf32>
      %29 = arith.addf %25, %28 : vector<128x128xf32>
      %30 = tpu.matmul %24, %7, %cst_2 {dimension_numbers = #tpu.dot_dimension_numbers<[1], [0], [0], [1], [0, 0, 1, 1], [], []>} : vector<128x128xbf16>, vector<128x128xbf16>, vector<128x128xf32> -> vector<128x128xf32>
      %31 = vector.extract_strided_slice %23 {offsets = [0, 0], sizes = [128, 1], strides = [1, 1]} : vector<128x128xf32> to vector<128x1xf32>
      %32 = vector.broadcast %31 : vector<128x1xf32> to vector<128x128xf32>
      %33 = arith.mulf %12, %32 : vector<128x128xf32>
      %34 = arith.addf %33, %30 : vector<128x128xf32>
      tpu.vector_store %arg9[%c0, %c0], %17 {strides = array<i32>} : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>, 
      tpu.vector_store %arg10[%c0, %c0], %29 {strides = array<i32>} : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>, 
      tpu.vector_store %arg8[%c0, %c0], %34 {strides = array<i32>} : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>, 
    }
    scf.if %1 {
      %10 = vector.load %arg10[%c0, %c0] : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x1xf32>
      %11 = vector.load %arg8[%c0, %c0] : memref<128x128xf32, #tpu.memory_space<vmem>>, vector<128x128xf32>
      %12 = vector.broadcast %10 : vector<128x1xf32> to vector<128x128xf32>
      %13 = arith.divf %11, %12 : vector<128x128xf32>
      %14 = arith.truncf %13 : vector<128x128xf32> to vector<128x128xbf16>
      %15 = vector.shape_cast %14 : vector<128x128xbf16> to vector<1x1x128x128xbf16>
      tpu.vector_store %arg7[%c0, %c0, %c0, %c0], %15 {strides = array<i32>} : memref<1x1x128x128xbf16, #tpu.memory_space<vmem>>, vector<1x1x128x128xbf16>, 
    }
    return
  }
  func.func @transform_0(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_1(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_2(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg3, %c0_i32 : i32, i32, i32, i32
  }
  func.func @transform_3(%arg0: i32, %arg1: i32, %arg2: i32, %arg3: i32) -> (i32, i32, i32, i32) {
    %c0_i32 = arith.constant 0 : i32
    return %arg0, %arg1, %arg2, %c0_i32 : i32, i32, i32, i32
  }
}

